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
    time("sig-agg k=16")(
      sh.groupBy("doc_id")
        .agg(org.apache.spark.sql.graft.MinHashAgg.of(col("shingle"), 16).as("sig"))
        .count())
    time("sig-agg k=64")(
      sh.groupBy("doc_id")
        .agg(org.apache.spark.sql.graft.MinHashAgg.of(col("shingle"), 64).as("sig"))
        .count())
    for (i <- 1 to 2)
      time(s"minHashLsh fast run$i")(
        Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.8).count())
    for (i <- 1 to 2)
      time(s"jaccardPairs run$i")(
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    spark.stop()
  }
}
