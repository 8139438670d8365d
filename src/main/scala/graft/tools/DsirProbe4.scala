package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Stage-duration listener probe: which STAGE carries the 4s in the
  * maxscore/select_t shapes that the exact-select shape doesn't pay?
  */
object DsirProbe4 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = graft.Sessions.local(app = "graft-dsir-probe4")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
        System.err.println(f"[stage] id=${i.stageId} tasks=${i.numTasks} " +
          f"ms=${ms.getOrElse(-1L)} name=${i.name.takeWhile(_ != '\n').take(80)}")
      }
    })
    import graft.operators.TextOps
    val docs = graft.model.Tables.load(spark, dir, "documents")
    val target = docs.filter(col("source") === "src0")
    val n = args(0) match {
      case "select" => TextOps.dsirSelect(docs, target, "doc_id", "text",
        "source", keepFrac = 0.25, hexDigits = 2).count()
      case "maxscore" => TextOps.dsirScores(docs, target, "doc_id", "text", 2)
        .agg(max("score")).count()
    }
    System.err.println(s"[probe4] rows=$n")
    spark.stop()
  }
}
