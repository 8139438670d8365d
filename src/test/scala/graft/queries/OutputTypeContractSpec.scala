package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.types._

/** Gate OUTPUT-TYPE contract (SURVEY §5.2): the driver hashes Spark and
  * DuckDB result values after canonicalization, and its canonicalization
  * of DECIMAL(precision > 18) diverges from DuckDB's while its
  * value-by-value comparison does not (round-5 root cause: 5 gates
  * value-identical to the oracle yet hash-red, all with wide-decimal
  * output columns; every one of the other 273 gates — none with wide
  * decimals — hash-green). Operators may carry DECIMAL(38,0) INTERNALS
  * for overflow headroom; the gated projection must render such columns
  * as STRING (or BIGINT when provably in range), mirrored in the oracle.
  *
  * This spec enforces the contract over EVERY registered gate: it invokes
  * each gate lambda against the sf0.001 fixtures and walks the result
  * schema (into structs/arrays/maps) rejecting any DecimalType with
  * precision > 18. Gates that stage scratch data or run streams at
  * construction time do so here too — that cost is the price of a
  * contract with no exemption list a new operator could slip past.
  */
class OutputTypeContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def wideDecimals(dt: DataType, path: String): Seq[String] =
    dt match {
      case d: DecimalType if d.precision > 18 =>
        Seq(s"$path: $d")
      case s: StructType =>
        s.fields.toSeq.flatMap(f =>
          wideDecimals(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => wideDecimals(a.elementType, s"$path[]")
      case m: MapType =>
        wideDecimals(m.keyType, s"$path<key>") ++
          wideDecimals(m.valueType, s"$path<value>")
      case _ => Seq.empty
    }

  test("no gate output column is DECIMAL(precision > 18)") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, run) =>
        val schema =
          try run(spark, dir).schema
          catch {
            case e: Throwable =>
              fail(s"$name failed to construct at sf0.001: ${e.getMessage}")
          }
        schema.fields.toSeq.flatMap(f =>
          wideDecimals(f.dataType, s"$name.${f.name}"))
    }
    assert(violations.isEmpty,
      "wide-decimal gate outputs trip the driver's hash canonicalization " +
        "(render as STRING in the gated projection, keep decimal " +
        s"internals):\n  ${violations.mkString("\n  ")}")
  }
}
