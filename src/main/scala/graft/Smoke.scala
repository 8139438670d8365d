package graft

/** Local smoke runner mirroring the driver's entry check: SparkEntry.entry
  * on sf0.001 must return rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE entry rows=$n cols=${df.columns.length}")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
