package graft.tools

/** Plan audit: does the unmaterialized minHashLsh plan dedupe its shared
  * shingle/band subtrees via ReuseExchange (shuffle-file reuse — the
  * cheap materialization), or does it genuinely recompute them?
  */
object MinHashProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-minhash-probe3")
    import graft.operators.Dedup
    val df = Dedup.minHashLsh(graft.model.Tables.load(spark, dir, "documents"),
      "doc_id", "text", n = 3, k = 64, bands = 16, threshold = 0.8,
      portable = false, materialize = false)
    df.count() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    def n(p: String) = p.r.findAllIn(plan).size
    println(s"[plan] Exchange=${n("Exchange")} ReusedExchange=${n("ReusedExchange")} " +
      s"Generate=${n("Generate explode")} MinHashAgg=${n("minhashagg|MinHashAgg")} " +
      s"InMemory=${n("InMemoryTableScan")}")
    spark.stop()
  }
}
