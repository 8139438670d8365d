package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.types._

/** Gate OUTPUT-TYPE contract (SURVEY §5.2): the driver hashes Spark and
  * DuckDB result values after canonicalization, and its canonicalization
  * of DECIMAL output diverges from DuckDB's while its value-by-value
  * comparison does not. Empirical history: round 5 found five gates
  * value-identical to the oracle yet hash-red, all with wide
  * (precision > 18) decimal output; round 11 tightened the finding —
  * q1_agg rendered its exact sums as DECIMAL(18,6) and went driver-red
  * while both the local mirror and the sf1 oracle said PASS. Root cause
  * (reproduced locally, PLANS r12): the driver's DuckDB→pandas side
  * renders DECIMAL through float64 ("137869.0") while the Spark parquet
  * dump reads back as exact decimal ("137869.000000"), so DECIMAL of
  * ANY precision is driver-hash-unsafe. Operators may carry decimal
  * INTERNALS (including DECIMAL(38,*) for overflow headroom); the gated
  * projection must render such columns as STRING (or BIGINT/DOUBLE when
  * provably in range), mirrored in the oracle SQL.
  *
  * This spec enforces the contract over EVERY registered gate: it invokes
  * each gate lambda against the sf0.001 fixtures and walks the result
  * schema (into structs/arrays/maps) rejecting any DecimalType. Gates
  * that stage scratch data or run streams at construction time do so
  * here too — that cost is the price of a contract with no exemption
  * list a new operator could slip past.
  */
class OutputTypeContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def decimals(dt: DataType, path: String): Seq[String] =
    dt match {
      case d: DecimalType =>
        Seq(s"$path: $d")
      case s: StructType =>
        s.fields.toSeq.flatMap(f =>
          decimals(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => decimals(a.elementType, s"$path[]")
      case m: MapType =>
        decimals(m.keyType, s"$path<key>") ++
          decimals(m.valueType, s"$path<value>")
      case _ => Seq.empty
    }

  test("no gate output column is DECIMAL (any precision)") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, run) =>
        val schema =
          try run(spark, dir).schema
          catch {
            case e: Throwable =>
              fail(s"$name failed to construct at sf0.001: ${e.getMessage}")
          }
        schema.fields.toSeq.flatMap(f =>
          decimals(f.dataType, s"$name.${f.name}"))
    }
    assert(violations.isEmpty,
      "decimal-typed gate outputs trip the driver's hash canonicalization " +
        "(render as STRING in the gated projection, keep decimal " +
        s"internals):\n  ${violations.mkString("\n  ")}")
  }
}
