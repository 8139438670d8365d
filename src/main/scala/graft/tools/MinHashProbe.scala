package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.model.Tables
import graft.operators.Dedup

/** Dev tool: stage-level timing of the MinHash-LSH fast path (signature
  * aggregation vs candidate generation vs pair-restricted verify).
  */
object MinHashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.load(spark, sfDir, "documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      spark.catalog.clearCache()
    }

    // warmup
    Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.8).count()
    spark.catalog.clearCache()

    val sh = Dedup.shingleSet(docs, "doc_id", "text", 3)
    time("shingleSet")(sh.count())

    // candidate-set sizes per banding config (pre-distinct and distinct)
    for ((k, b) <- Seq((16, 4), (64, 16))) {
      val r = k / b
      val shp = sh.persist()
      val sig = shp.groupBy("doc_id").agg(
        org.apache.spark.sql.graft.MinHashAgg.of(col("shingle"), k).as("sig"))
      val bandDf = (0 until b).map { bb =>
        sig.select(col("doc_id"), lit(bb).as("band"),
          xxhash64(slice(col("sig"), bb * r + 1, r)).as("bh"))
      }.reduce(_ unionAll _).persist()
      time(s"k=$k raw band-join rows")(
        bandDf.as("x").join(bandDf.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id")).count())
      time(s"k=$k distinct cand pairs")(
        bandDf.as("x").join(bandDf.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
          .distinct().count())
      bandDf.unpersist(); shp.unpersist()
    }

    for (i <- 1 to 2)
      time(s"minHashLsh k16 run$i")(
        Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.8).count())
    for (i <- 1 to 2)
      time(s"minHashLsh k64 run$i")(
        Dedup.minHashLsh(docs, "doc_id", "text", 3, 64, 16, 0.8).count())
    for (i <- 1 to 2)
      time(s"jaccardPairs run$i")(
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    spark.stop()
  }
}
