package graft.tools

import org.apache.spark.sql.functions._

/** Third DSIR probe: ONE measurement per JVM (args(0) selects it), fresh
  * state, to rule out cross-step cache/JIT contamination entirely.
  */
object DsirProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = graft.Sessions.local(app = "graft-dsir-probe3")
    import graft.operators.TextOps
    val docs = graft.model.Tables.load(spark, dir, "documents")
    val target = docs.filter(col("source") === "src0")
    def run(which: String): Long = which match {
      case "select" => TextOps.dsirSelect(docs, target, "doc_id", "text",
        "source", keepFrac = 0.25, hexDigits = 2).count()
      case "maxscore" => TextOps.dsirScores(docs, target, "doc_id", "text", 2)
        .agg(max("score")).count()
      case "select_t" => TextOps.dsirSelectThreshold(docs, target, "doc_id",
        "text", "source", keepFrac = 0.25, hexDigits = 2,
        sampleHexCeil = "40").count()
    }
    run(args(0)) // warmup
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc()
    val t0 = System.nanoTime()
    val n = run(args(0))
    System.err.println(
      f"[probe3] ${args(0)} rows=$n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
