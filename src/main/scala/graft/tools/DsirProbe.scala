package graft.tools

import org.apache.spark.sql.functions._

/** Phase-timing probe for the DSIR threshold-selection gate (round-10
  * bench line investigation): where do x6_dsir_select_t's seconds go —
  * scoring, the sampled-threshold branch, the keep pass, or the report
  * joins?
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = graft.Sessions.local(app = "graft-dsir-probe")
    import graft.operators.{Sample, TextOps}
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    val docs = graft.model.Tables.load(spark, dir, "documents")
    val target = docs.filter(col("source") === "src0")
    for (pass <- 1 to 2) {
      clear()
      val scored = TextOps.dsirScores(docs, target, "doc_id", "text", 2)
      time(s"p$pass scored.count (full scoring)")(
        System.err.println("rows=" + scored.count()))
      clear()
      val scored2 = TextOps.dsirScores(docs, target, "doc_id", "text", 2)
      time(s"p$pass sampled scoring only")(
        System.err.println("rows=" + scored2
          .filter(Sample.bernoulliPortable("doc_id", "40")).count()))
      clear()
      time(s"p$pass full dsirSelectThreshold")(
        System.err.println("rows=" + TextOps.dsirSelectThreshold(
          docs, target, "doc_id", "text", "source",
          keepFrac = 0.25, hexDigits = 2, sampleHexCeil = "40").count()))
      clear()
      time(s"p$pass exact dsirSelect")(
        System.err.println("rows=" + TextOps.dsirSelect(
          docs, target, "doc_id", "text", "source", keepFrac = 0.25,
          hexDigits = 2).count()))
    }
    spark.stop()
  }
}

/** Plan diff: why does the exact dsirSelect run ~8x faster than a plain
  * count() of its own scoring input?
  */
object DsirPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = graft.Sessions.local(app = "graft-dsir-planprobe")
    import graft.operators.TextOps
    val docs = graft.model.Tables.load(spark, dir, "documents")
    val target = docs.filter(col("source") === "src0")
    val scored = TextOps.dsirScores(docs, target, "doc_id", "text", 2)
    println("===== scored.count plan =====")
    println(scored.groupBy().count().queryExecution.executedPlan.toString)
    println("===== exact dsirSelect plan =====")
    println(TextOps.dsirSelect(docs, target, "doc_id", "text", "source",
      keepFrac = 0.25, hexDigits = 2).queryExecution.executedPlan.toString)
    spark.stop()
  }
}
