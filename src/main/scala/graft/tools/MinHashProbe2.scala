package graft.tools

import org.apache.spark.sql.functions._

/** materialize=true (persist sh+bands) vs materialize=false
  * (ReuseExchange dedups the shared subtrees?) A/B for minHashLsh at the
  * bench config (k=64, 16 bands). Warm: 1 untimed + 3 timed per mode.
  */
object MinHashProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-minhash-probe2")
    import graft.operators.Dedup
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def run(mat: Boolean): Double = {
      clear()
      val t0 = System.nanoTime()
      Dedup.minHashLsh(graft.model.Tables.load(spark, dir, "documents"),
        "doc_id", "text", n = 3, k = 64, bands = 16, threshold = 0.8,
        portable = false, materialize = mat).count()
      (System.nanoTime() - t0) / 1e9
    }
    for (mat <- Seq(true, false)) {
      run(mat) // warm
      val ts = (1 to 3).map(_ => run(mat))
      System.err.println(f"[probe] materialize=$mat: " +
        ts.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
