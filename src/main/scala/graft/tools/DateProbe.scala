package graft.tools

import org.apache.spark.sql.functions._

/** Reproducer for the sf1 o11_backfill date-decode failure. */
object DateProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = graft.Sessions.local(app = "graft-date-probe")
    val ev = graft.model.Tables.load(spark, dir, "events")
      .withColumn("d", to_date(col("ts")))
    ev.select("ts", "d").show(3, false)
    println("schema: " + ev.schema.simpleString.take(300))
    println("min-as-string: " +
      ev.agg(min(col("d")).cast("string")).head().getString(0))
    try println("min-as-date: " + ev.agg(min(col("d"))).head().getDate(0))
    catch { case e: Throwable =>
      println("FAILED: " + e)
      var c = e.getCause
      while (c != null) { println("cause: " + c); c = c.getCause }
    }
    spark.stop()
  }
}
