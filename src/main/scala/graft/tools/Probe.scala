package graft.tools

import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for bench investigation (not part of the
  * driver contract; kept in-repo so perf work is reproducible). Current
  * target: x3_dbscan parameter/latency surface.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-probe")
    import graft.operators.Density
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    val pts = graft.model.Tables.load(spark, dir, "events")
      .filter(col("user_id") % 5 === 0)
      .select(col("event_id").as("id"),
        array(col("user_id").cast("double"),
          col("value") / lit(100.0)).as("pt"))
    for ((eps, mp) <- Seq((0.05, 4), (0.03, 3), (0.02, 3));
         pass <- 1 to 2) {
      clear()
      time(s"dbscan eps=$eps minPts=$mp pass$pass")(
        System.err.println("rows=" +
          Density.dbscan(pts, "id", "pt", eps, mp).count()))
    }
    spark.stop()
  }
}
