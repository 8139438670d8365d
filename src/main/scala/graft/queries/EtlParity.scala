package graft.queries

import org.apache.spark.sql.functions._
import graft.Scratch
import graft.etl.Etl

/** End-to-end pipeline parity query: runs the full O1-O10 DAG (landing JSON
  * → parquet → canonical SQL transform → avro → warehouse table → count
  * gate → cleanup) on the scale factor's lineitem, then reports the loaded
  * table's row count. The oracle is LEAST(count, 100) because the canonical
  * transform is the reference's `SELECT * ... LIMIT 100` (my_query.py:2-8)
  * with a total-order ORDER BY.
  */
object EtlParity extends QueryModule {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("o10_pipeline", Some("""
      SELECT CAST(LEAST(count(*), 100) AS BIGINT) AS n FROM lineitem""")) {
      (s, dir) =>
      val (run, fq) = Etl.pipeline(s, Scratch.fresh("etl"),
        s"${dir.stripSuffix("/")}/lineitem.parquet",
        orderBy = Seq("l_orderkey", "l_linenumber"))
      require(run.succeeded,
        s"pipeline failed: ${run.failed.mkString(",")} skipped: ${run.skipped.mkString(",")}")
      s.table(fq).agg(count(lit(1)).as("n"))
    })
}
