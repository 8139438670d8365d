package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interleaved A/B for the r15 size-carry idea on the exact-Jaccard truth
  * path (x2_jaccard_pairs shape): the shipped form re-aggregates per-doc
  * shingle counts (`cnt`) from the persisted shingle set and joins them
  * onto the pair table twice (scorePairs), even though the length-filter
  * window already attached each doc's size (`__n`) to every row entering
  * the self-join — so every (da, db) group also knows na/nb for free.
  * Arm "carried" aggregates `first(a.__n)/first(b.__n)` alongside `ni`
  * and scores directly, dropping the cnt aggregation pass over the
  * exploded table and both cnt joins. Both arms inlined (operator-
  * independent); output equality asserted before timing.
  *
  * Usage: runMain graft.tools.CntCarryProbe [reps]
  */
object CntCarryProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-cnt-carry-probe")
    val t = 0.8
    def docs = graft.model.Tables.load(spark, dir, "documents")
    def base(): (DataFrame, DataFrame) = {
      val sh = graft.operators.Dedup.shingleSet(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      val withN = sh.withColumn("__n", count(lit(1)).over(w))
      val p = spark.sparkContext.defaultParallelism
      val byShingle = withN.repartition(p, col("shingle"))
      val joined = byShingle.as("a").hint("shuffle_merge")
        .join(byShingle.as("b").hint("shuffle_merge"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id") &&
            least(col("a.__n"), col("b.__n")).cast("double") >=
              lit(t) * greatest(col("a.__n"), col("b.__n")).cast("double") -
                lit(0.5))
      (sh, joined)
    }
    def shipped(): DataFrame = {
      val (sh, joined) = base()
      val inter = joined
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("ni"))
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      inter
        .join(cnt.select(col("doc_id").as("da"), col("n_sh").as("na")), "da")
        .join(cnt.select(col("doc_id").as("db"), col("n_sh").as("nb")), "db")
        .withColumn("jacc", col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double"))
        .filter(col("jacc") >= t)
        .select("da", "db", "jacc")
        .orderBy("da", "db")
    }
    def carried(): DataFrame = {
      val (_, joined) = base()
      joined
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("ni"),
          first(col("a.__n")).as("na"), first(col("b.__n")).as("nb"))
        .withColumn("jacc", col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double"))
        .filter(col("jacc") >= t)
        .select("da", "db", "jacc")
        .orderBy("da", "db")
    }
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def run(d: => DataFrame): Double = {
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      scrub(); dt
    }
    val a = shipped().collect().map(_.toSeq).toSet; scrub()
    val b = carried().collect().map(_.toSeq).toSet; scrub()
    require(a == b, s"arms disagree: shipped=${a.size} carried=${b.size}")
    run(shipped()); run(carried()) // warmup
    val ss = scala.collection.mutable.ArrayBuffer.empty[Double]
    val cs = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) { ss += run(shipped()); cs += run(carried()) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(",")
    System.err.println(s"[cnt-carry] pairs=${a.size} " +
      s"shipped=[${fmt(ss.toSeq)}] carried=[${fmt(cs.toSeq)}]")
    spark.stop()
  }
}
