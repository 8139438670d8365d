package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query over the same
  * parquet tables. Column names/aliases MUST match between the two — the
  * driver's compare sorts columns by name before hashing values. Every query
  * ends in a total-order ORDER BY (SURVEY.md §2.2 canonical-form rule).
  *
  * Float determinism contract: never hash raw double aggregates. Sums go
  * through CAST(x AS DECIMAL(18,6)) per row (exact decimal accumulation,
  * order-independent), then CAST(... AS DOUBLE) — bit-identical in Spark and
  * DuckDB regardless of partial-aggregation order.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    bench: Boolean = false)(
    val run: (SparkSession, String) => DataFrame)

trait QueryModule {
  def defs: Seq[QueryDef]
}
