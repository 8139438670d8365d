package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev tool: dump formatted physical plans for the headline queries so scan
  * pushdown (PushedFilters/ReadSchema), join strategies and exchange
  * placement can be audited.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchNames.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
