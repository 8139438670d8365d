package graft

import org.scalatest.funsuite.AnyFunSuite

/** Machine-enforces SURVEY.md §8's status-line gate counts against the
  * actual registry — the OutputTypeContractSpec treatment for the drift
  * class that recurred in rounds 5 and 6 (hand-maintained counts going
  * stale as gates were added). The contract is the exact phrase
  * "N gate entries; M oracle-checkable": N must equal
  * `SparkEntry.queries.size` and M `SparkEntry.oracleSql.size`.
  */
class SurveyCountSpec extends AnyFunSuite {

  test("SURVEY §8 status line counts match the gate registry") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val pat = """(\d+) gate entries; (\d+) oracle-checkable""".r
    val hits = pat.findAllMatchIn(survey).toSeq
    assert(hits.size == 1,
      s"SURVEY.md must state the gate counts exactly once " +
        s"('N gate entries; M oracle-checkable'); found ${hits.size}")
    val claimedGates = hits.head.group(1).toInt
    val claimedOracles = hits.head.group(2).toInt
    assert(claimedGates == SparkEntry.queries.size,
      s"SURVEY.md claims $claimedGates gate entries but " +
        s"SparkEntry.queries has ${SparkEntry.queries.size} — " +
        "update the §8 status line")
    assert(claimedOracles == SparkEntry.oracleSql.size,
      s"SURVEY.md claims $claimedOracles oracle-checkable gates but " +
        s"SparkEntry.oracleSql has ${SparkEntry.oracleSql.size} — " +
        "update the §8 status line")
  }

  test("every oracle entry names a registered gate; none rows-only") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracleSql entries without a query: $orphan")
    // r14: the three MinHash signature gates (the last rows-only members)
    // moved to verdict form (replayable exact pair count + subset/recall
    // booleans with VerdictGateSpec teeth) — the registry is now 100%
    // oracle-checkable and must stay that way: a forgotten oracle shows
    // up here instead of as a silent weaker check in the driver.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"gates without an oracle: $rowsOnly — every operator needs one")
  }
}
