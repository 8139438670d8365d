package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interleaved A/B (EdgeSymProbe protocol): unbounded Levenshtein +
  * post-filter (the pre-r14 editDistancePairs verify) vs the shipped
  * bounded-threshold form, on the x2_editdist gate's exact shape
  * (3-shingle candidates, 60-char prefix, maxDist 12). Output equality
  * is asserted before timing.
  */
object EditDistProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-editdist-probe")
    def docs = graft.model.Tables.load(spark, dir, "documents")
    def bounded = graft.operators.Dedup.editDistancePairs(
      docs, "doc_id", "text", n = 3, prefixLen = 60, maxDist = 12)
    def unbounded = {
      val sh = graft.operators.Dedup.shingleSet(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val p = spark.sparkContext.defaultParallelism
      val bySh = sh.repartition(p, col("shingle"))
      val cand = bySh.as("a").hint("shuffle_merge")
        .join(bySh.as("b").hint("shuffle_merge"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("ni")).select("da", "db")
      val pre = docs.select(col("doc_id"),
        substring(col("text"), 1, 60).as("__pre"))
      cand
        .join(pre.select(col("doc_id").as("da"), col("__pre").as("pa")), "da")
        .join(pre.select(col("doc_id").as("db"), col("__pre").as("pb")), "db")
        .withColumn("dist", levenshtein(col("pa"), col("pb")))
        .filter(col("dist") <= 12)
        .select("da", "db", "dist")
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
    val nb = bounded.count(); scrub()
    val nu = unbounded.count(); scrub()
    require(nb == nu, s"forms disagree: bounded=$nb unbounded=$nu")
    run(unbounded); run(bounded) // warmup
    val us = scala.collection.mutable.ArrayBuffer.empty[Double]
    val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to 5) { us += run(unbounded); bs += run(bounded) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(",")
    System.err.println(s"[editdist] pairs=$nb " +
      s"unbounded=[${fmt(us.toSeq)}] bounded=[${fmt(bs.toSeq)}]")
    spark.stop()
  }
}
