package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import scala.collection.mutable

/** Per-stage TASK-duration skew audit for any registered gate (guide
  * §2.5: max/median above ~5-10x is worth fixing) — the lens VERDICT r14
  * #2 asks for on the k-truss wedge stage. Runs the gate args(0) N times
  * (args(1), default 2 — read run 2+, JIT-warm) and prints, per completed
  * stage, task count, stage wall ms, and the min/median/max task ms.
  *
  * Usage: runMain graft.tools.TaskSkewProbe <gate> [runs]
  */
object TaskSkewProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TaskSkewProbe <gate> [runs]")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-task-skew-probe")
    val taskMs = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        taskMs.synchronized {
          taskMs.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) +=
            t.taskInfo.duration
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        val ts = taskMs.synchronized {
          taskMs.getOrElse(i.stageId, mutable.ArrayBuffer.empty).toSeq.sorted
        }
        val (mn, md, mx) =
          if (ts.isEmpty) (-1L, -1L, -1L)
          else (ts.head, ts(ts.size / 2), ts.last)
        System.err.println(f"[skew] id=${i.stageId}%-4d " +
          f"tasks=${i.numTasks}%-3d wall=$wall%-6d " +
          f"taskMs min=$mn%-5d med=$md%-5d max=$mx%-6d " +
          f"maxOverMed=${if (md > 0) mx.toDouble / md else -1.0}%5.1f  " +
          i.name.takeWhile(_ != '\n').take(60))
      }
    })
    val runs = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(2)
    for (r <- 1 to runs) {
      System.err.println(s"[skew] --- run $r ---")
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(args(0))(spark, dir).count()
      System.err.println(
        f"[skew] run $r: rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
