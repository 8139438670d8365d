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
    def jac(): Long = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
    for (i <- 1 to 4) time(s"jaccard pinned-smj run$i")(jac())
    for (i <- 1 to 3)
      time(s"minhash pinned-smj run$i")(
        Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.8,
          portable = true).count())
    spark.stop()
  }
}
