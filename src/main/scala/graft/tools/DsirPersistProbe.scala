package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interleaved A/B for VERDICT r14 #8: dsirSelectThreshold's deliberate
  * NON-persist of the scored subtree (shipped) vs a persisted variant.
  * The in-code sf1 measurement (persist 5.85 s vs unpersisted 4.15 s)
  * predates the lshAudit-era persists elsewhere; this re-adjudicates it
  * interleaved at matched weather on the x6_dsir_select_t gate shape.
  * Output equality is asserted before timing.
  *
  * Usage: runMain graft.tools.DsirPersistProbe [reps]
  */
object DsirPersistProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-dsir-persist-probe")
    import org.apache.spark.sql.expressions.Window
    def docs = graft.model.Tables.load(spark, dir, "documents")

    def shipped = graft.operators.TextOps.dsirSelectThreshold(docs,
        docs.filter(col("source") === "src0"),
        "doc_id", "text", "source", keepFrac = 0.25, hexDigits = 2,
        sampleHexCeil = "40")
      .orderBy("source")

    // dsirSelectThreshold with `scored` persisted — otherwise verbatim.
    def persisted: DataFrame = {
      val raw = docs
      val scored = graft.operators.TextOps.dsirScores(raw,
          raw.filter(col("source") === "src0"), "doc_id", "text", 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val samp = scored.filter(
        graft.operators.Sample.bernoulliPortable("doc_id", "40"))
      val thr = samp
        .withColumn("rn", row_number().over(
          Window.orderBy(desc("score"), col("doc_id"))))
        .withColumn("m", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .agg(max(when(col("rn") === floor(col("m") * lit(0.25)),
            col("score"))).as("__thr"),
          count(lit(1)).as("n_sample"))
      val kept = scored.crossJoin(broadcast(thr))
        .filter(col("score") >= col("__thr"))
        .select(col("doc_id"), lit(1L).as("__keep"))
      raw.select(col("doc_id"), col("source"))
        .join(kept, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum("__keep"), lit(0L)).as("n_kept"))
        .withColumn("keep_frac",
          col("n_kept").cast("double") / col("n_docs").cast("double"))
        .crossJoin(broadcast(thr))
        .withColumn("has_threshold", col("__thr").isNotNull)
        .drop("__thr")
        .orderBy("source")
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
    val a = shipped.collect().map(_.toSeq).toSet; scrub()
    val b = persisted.collect().map(_.toSeq).toSet; scrub()
    require(a == b, s"arms disagree: shipped=$a persisted=$b")
    run(shipped); run(persisted) // warmup
    val ss = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ps = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) { ss += run(shipped); ps += run(persisted) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(",")
    System.err.println(s"[dsir-persist] " +
      s"shipped=[${fmt(ss.toSeq)}] persisted=[${fmt(ps.toSeq)}]")
    spark.stop()
  }
}
