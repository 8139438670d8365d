package graft.tools

/** Prints the full gate registry, one name per line ("name oracle|rowsonly
  * bench|-"), for sweep orchestration scripts (the chunked sf1 sweep
  * shells out to this instead of hand-maintaining a gate list that would
  * drift from the registry — the round-5/6 stale-count failure class).
  */
object ListGates {
  def main(args: Array[String]): Unit = {
    val oracles = graft.SparkEntry.oracleSql.keySet
    val bench = graft.SparkEntry.benchNames.toSet
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
      val kind = if (oracles(n)) "oracle" else "rowsonly"
      val b = if (bench(n)) "bench" else "-"
      println(s"$n $kind $b")
    }
  }
}
