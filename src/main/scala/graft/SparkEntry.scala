package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry in `queries` is one operator from SURVEY.md §2 (or a mandated
  * extension, §2.4); `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's hash-match correctness gate.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] =
    Seq(Relational, Extensions, EtlParity, StreamingGates, Maintenance)

  private val all: Seq[QueryDef] = modules.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference transform in canonical deterministic form
    * (my_query.py:2-8 with total-order ORDER BY, SURVEY.md §2.2 R1-R3).
    */
  def entry(spark: SparkSession): DataFrame = {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    df.createOrReplaceTempView("df")
    spark.sql(
      "SELECT * FROM df ORDER BY l_orderkey, l_linenumber LIMIT 100")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.run).toMap

  /** DuckDB-runnable oracle per query (same parquet tables, same column
    * aliases). Omitted for non-SQL-expressible ops → rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.collect { case d if d.oracle.isDefined =>
      d.name -> d.oracle.get.stripMargin.trim.replaceAll("\\s+", " ")
    }.toMap

  /** Headline subset timed by Bench at sf0.1. */
  def benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
