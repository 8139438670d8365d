package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interleaved A/B (EdgeSymProbe protocol): inside the exact-Jaccard
  * truth self-join, attach each doc's shingle-set size for the
  * length-filter residual via
  *   A. the shipped unordered window  count(1) over (partition by id)
  *      — one Exchange(id) + Sort + WindowExec over the exploded table;
  *   B. a join against the per-doc count aggregate the caller already
  *      computes (broadcast at small scale; SMJ at large)
  * and verify both forms return the IDENTICAL thresholded pair count
  * before timing. Noop-sink timing, A B A B ... in one JVM.
  */
object JaccardSizeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-jaccsize-probe")
    val p = spark.sparkContext.defaultParallelism
    val t = 0.8
    def sh = graft.operators.Dedup
      .shingleSet(graft.model.Tables.load(spark, dir, "documents"),
        "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def scored(withN: DataFrame, cnt: DataFrame): DataFrame = {
      val byShingle = withN.repartition(p, col("shingle"))
      val cond = col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id") &&
        least(col("a.__n"), col("b.__n")).cast("double") >=
          lit(t) * greatest(col("a.__n"), col("b.__n")).cast("double") -
            lit(0.5)
      byShingle.as("a").hint("shuffle_merge")
        .join(byShingle.as("b").hint("shuffle_merge"), cond)
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("ni"))
        .join(cnt.select(col("doc_id").as("da"), col("n_sh").as("na")), "da")
        .join(cnt.select(col("doc_id").as("db"), col("n_sh").as("nb")), "db")
        .withColumn("jacc", col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double"))
        .filter(col("jacc") >= t)
        .select("da", "db", "jacc")
    }
    def formA(s: DataFrame, cnt: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      scored(s.withColumn("__n", count(lit(1)).over(w)), cnt)
    }
    def formB(s: DataFrame, cnt: DataFrame): DataFrame =
      scored(s.join(cnt.withColumnRenamed("n_sh", "__n"), "doc_id"), cnt)
    def run(mk: (DataFrame, DataFrame) => DataFrame): Double = {
      val s = sh
      val cnt = s.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val t0 = System.nanoTime()
      mk(s, cnt).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      dt
    }
    // Equality gate first: identical pair counts or the timing is moot.
    val s0 = sh
    val cnt0 = s0.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val (ca, cb) = (formA(s0, cnt0).count(), formB(s0, cnt0).count())
    require(ca == cb, s"forms disagree: window=$ca join=$cb")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    run(formA); run(formB) // warmup
    val as = scala.collection.mutable.ArrayBuffer.empty[Double]
    val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to 5) { as += run(formA); bs += run(formB) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(",")
    System.err.println(s"[jaccsize] pairs=$ca window=[${fmt(as.toSeq)}] " +
      s"join=[${fmt(bs.toSeq)}]")
    spark.stop()
  }
}
