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

  test("oracle coverage: only the known sketch gates are rows-only") {
    // r13: the approx/bloom sketch gates moved to driver-checkable
    // verdict form; only the MinHash signature gates remain rows-only.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = Set("x2_minhash_fast", "x2_minhash_k64",
      "x2_minhash_k128")
    assert(noOracle == expected,
      s"rows-only gate set changed: $noOracle — every new operator needs an oracle")
  }
}
