package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-duration audit for any registered gate: run it once (args(0) =
  * gate name) against SPARK_GRAFT_SF_DIR and print every completed
  * stage's task count and wall duration — the fixed-cost-per-stage lens
  * that explained the dsir threshold-vs-exact gap (PLANS round 10).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-stage-probe")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
        System.err.println(f"[stage] id=${i.stageId}%-4d tasks=${i.numTasks}%-3d " +
          f"ms=${ms.getOrElse(-1L)}%-6d ${i.name.takeWhile(_ != '\n').take(70)}")
      }
    })
    // args(1) (optional) = run count: run 2+ to see a JIT-warm profile —
    // the first run's stage times carry codegen-compile and JIT noise.
    // Persisted state is scrubbed between runs exactly like Bench.once.
    val runs = if (args.length >= 2) args(1).toInt else 1
    for (r <- 1 to runs) {
      System.err.println(s"[probe] --- run $r ---")
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(args(0))(spark, dir).count()
      System.err.println(
        f"[probe] ${args(0)} run=$r rows=$n " +
          f"total=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
