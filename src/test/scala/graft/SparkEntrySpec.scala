package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-assertions on the driver contract — authoring mistakes a future
  * round could introduce (duplicate gate names silently shadow each other
  * in the Map; a bench name that resolves to nothing breaks the driver's
  * BENCH parse; an empty oracle string would null a CORRECTNESS row).
  */
class SparkEntrySpec extends AnyFunSuite {

  test("gate names are unique across all query modules") {
    val names = Seq(
      queries.Relational, queries.Extensions, queries.EtlParity,
      queries.StreamingGates, queries.Maintenance).flatMap(_.defs.map(_.name))
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate gate names: ${dups.mkString(", ")}")
    assert(names.size == SparkEntry.queries.size)
  }

  test("benchNames resolve to registered queries") {
    val q = SparkEntry.queries.keySet
    assert(SparkEntry.benchNames.nonEmpty)
    assert(SparkEntry.benchNames.forall(q.contains))
  }

  test("every oracle is non-empty, single-line-safe SQL") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name has an empty oracle")
      // Verify normalizes whitespace; a stray unescaped control char here
      // would corrupt the driver's oracle_sql.json.
      assert(!sql.exists(c => c == '\n' || c == '\r' || c == '\t'),
        s"$name oracle kept raw control characters after normalization")
      assert(sql.toLowerCase.contains("select"), s"$name oracle has no SELECT")
    }
  }

  test("oracle coverage: every gate is oracle-checkable") {
    // r14: the MinHash signature gates (the last rows-only members)
    // moved to verdict form — every gate now has a DuckDB oracle, and
    // any new gate must ship with one.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"gates without an oracle: $noOracle — every operator needs one")
  }
}
