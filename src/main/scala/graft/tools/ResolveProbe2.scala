package graft.tools
import graft.Sessions
import graft.model.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Stage-level timing of x2_dedup_resolve at sf0.1: pair generation vs
  * cluster resolution, to aim optimization at the dominant stage.
  */
object ResolveProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE2 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (_ <- 1 to 2) {
      val docs = Tables.load(spark, sfDir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      timed("pairs-only") { pairs.count() }
      val pairsCached = pairs.localCheckpoint(true)
      timed("resolve-only") {
        Dedup.resolveClusters(docs, "doc_id", pairsCached).count()
      }
      timed("full-gate") {
        Dedup.resolveClusters(docs, "doc_id",
          Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8))
          .count()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
