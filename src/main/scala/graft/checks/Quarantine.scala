package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level data-quality quarantine — the per-row sibling of the
  * pipeline-level [[Check]] gate (reference analogue: the check operator's
  * SQL gate, SURVEY.md §2.2 R5): instead of failing the whole run, split
  * the input into rows passing every rule and rows carrying the names of
  * the rules they violate, so bad records land in an errors sink while the
  * clean partition proceeds.
  *
  * Scale posture: rule evaluation is a pure codegen'd projection (one
  * `array_compact(array(when...))` per row, no shuffle); the audit is one
  * explode + groupBy over only the violating rows. A null rule result
  * (e.g. a comparison against a null column) counts as a violation —
  * three-valued logic must not let unknowns through a quality gate.
  */
object Quarantine {

  private def viol(rules: Seq[(String, Column)]): Column =
    array_compact(array(rules.map { case (n, c) =>
      when(!coalesce(c, lit(false)), lit(n)).otherwise(lit(null).cast("string"))
    }: _*))

  /** Rows passing every rule, unchanged. */
  def valid(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.filter(size(viol(rules)) === 0)

  /** Rows violating at least one rule, with a `reasons` array naming the
    * violated rules (in rule order).
    */
  def quarantined(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.withColumn("reasons", viol(rules)).filter(size(col("reasons")) > 0)

  /** Audit summary: one row per rule with its violation count (0 included),
    * plus a `__valid` row counting rows that passed everything.
    */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    import df.sparkSession.implicits._
    val ann = df.select(viol(rules).as("__viol"))
    val perRule = ann.select(explode(col("__viol")).as("rule"))
      .groupBy("rule").agg(count(lit(1)).as("n"))
    val names = rules.map(_._1).toDF("rule")
    val zeros = names.join(perRule, Seq("rule"), "left")
      .select(col("rule"), coalesce(col("n"), lit(0L)).as("n"))
    val validRow = ann.filter(size(col("__viol")) === 0)
      .agg(count(lit(1)).as("n"))
      .select(lit("__valid").as("rule"), col("n"))
    zeros.unionByName(validRow)
  }
}
