package graft.tools

import org.apache.spark.sql.functions._

/** Second-stage DSIR probe: discriminate md5/explode cost vs aggregation
  * shape vs job-count overhead in the threshold-selection gate.
  */
object DsirProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = graft.Sessions.local(app = "graft-dsir-probe2")
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
      time(s"p$pass max(score) full scoring")(System.err.println("= " +
        TextOps.dsirScores(docs, target, "doc_id", "text", 2)
          .agg(max("score")).collect().mkString))
      clear()
      time(s"p$pass scored.count")(System.err.println("= " +
        TextOps.dsirScores(docs, target, "doc_id", "text", 2).count()))
      clear()
      time(s"p$pass sample->thr only")(System.err.println("= " + {
        import org.apache.spark.sql.expressions.Window
        TextOps.dsirScores(docs, target, "doc_id", "text", 2)
          .filter(Sample.bernoulliPortable("doc_id", "40"))
          .withColumn("rn", row_number().over(
            Window.orderBy(desc("score"), col("doc_id"))))
          .withColumn("m", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .agg(max(when(col("rn") === floor(col("m") * lit(0.25)),
            col("score"))).as("t"), count(lit(1))).collect().mkString
      }))
    }
    spark.stop()
  }
}
