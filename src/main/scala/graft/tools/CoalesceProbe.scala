package graft.tools

/** Interleaved A/B (EdgeSymProbe protocol) for
  * spark.sql.adaptive.coalescePartitions.parallelismFirst — a RUNTIME
  * conf, so both arms run in ONE JVM with the flag toggled between
  * repetitions (A B A B ...), cancelling the machine's ordering bias.
  * Motivation: at sf0.1 the 8-core bench beats the 32-core bench 2.4× on
  * the dedup family at matched calibrations — small-shuffle
  * over-parallelization that parallelismFirst=true (the default) locks
  * in by coalescing toward max parallelism instead of the 128 MB
  * advisory size. Spark's own config docs recommend false in production.
  *
  * args = gate names (default: the dedup family + curation capstone).
  */
object CoalesceProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-coalesce-probe")
    val gates = if (args.nonEmpty) args.toSeq
      else Seq("x2_jaccard_pairs", "x2_dedup_resolve", "x6_curation3")
    val key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    def run(flag: Boolean): Double = {
      spark.conf.set(key, flag.toString)
      val t0 = System.nanoTime()
      gates.foreach(g => graft.SparkEntry.queries(g)(spark, dir).count())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      dt
    }
    run(flag = true); run(flag = false) // warmup both paths
    val ts = scala.collection.mutable.ArrayBuffer.empty[Double]
    val fs = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to 5) { ts += run(flag = true); fs += run(flag = false) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(",")
    System.err.println(s"[coalesce] gates=${gates.mkString("+")} " +
      s"parallelismFirst=true [${fmt(ts.toSeq)}] " +
      s"false [${fmt(fs.toSeq)}]")
    spark.stop()
  }
}
