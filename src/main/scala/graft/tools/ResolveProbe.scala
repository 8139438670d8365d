package graft.tools
import graft.{Sessions, SparkEntry}
object ResolveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    for (n <- Seq("x2_dedup_resolve", "x2_dedup_resolve", "ev3_stream_window", "ev4_stream_sessions")) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"PROBE $n ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
