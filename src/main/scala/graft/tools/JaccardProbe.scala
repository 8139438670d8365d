package graft.tools

import graft.Sessions
import graft.model.Tables
import graft.operators.Dedup

/** Dev tool: repeatability + AQE sensitivity of the shared-shingle join. */
object JaccardProbe {
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
    // simulate the bench harness: run every headline query once first
    graft.SparkEntry.benchNames.sorted.foreach { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"PROBE warm $n ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
    }
    for (i <- 1 to 3)
      time(s"minhash nopersist run$i")(
        Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.8,
          portable = false, materialize = false).count())
    for (i <- 1 to 3)
      time(s"minhash persist run$i")(
        Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.8,
          portable = false).count())
    spark.stop()
  }
}
