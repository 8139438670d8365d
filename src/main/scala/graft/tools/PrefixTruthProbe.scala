package graft.tools

import org.apache.spark.sql.DataFrame

/** Interleaved A/B (EdgeSymProbe protocol) for VERDICT r14 #4: the exact
  * Jaccard truth computation as the full inverted-index self-join with the
  * length-filter residual (shipped default, `prefixFilter = false`) vs the
  * PPJoin prefix-filtered candidate path (`prefixFilter = true`) — both
  * provably the same pair set (x2_jaccard_pairs / x2_jaccard_prefix share
  * one oracle). Decides whether the lshAudit/lshRecall truth branches and
  * the jaccardPairs default should flip to prefix filtering at sf0.1 scale,
  * or whether the crossover sits above it (the r14 doc's standing claim).
  * Output equality is asserted before timing.
  *
  * Usage: runMain graft.tools.PrefixTruthProbe [reps]
  */
object PrefixTruthProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-prefix-truth-probe")
    def docs = graft.model.Tables.load(spark, dir, "documents")
    def full = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8)
    def prefix = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8, prefixFilter = true)
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
    val a = full.collect().map(_.toSeq).toSet; scrub()
    val b = prefix.collect().map(_.toSeq).toSet; scrub()
    require(a == b, s"arms disagree: full=${a.size} prefix=${b.size}")
    run(full); run(prefix) // warmup
    val fs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ps = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) { fs += run(full); ps += run(prefix) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(",")
    System.err.println(s"[prefix-truth] pairs=${a.size} " +
      s"full=[${fmt(fs.toSeq)}] prefix=[${fmt(ps.toSeq)}]")
    spark.stop()
  }
}
