package graft.etl

import graft.{Scratch, SparkSpec}
import graft.pipeline.TaskResult
import java.nio.file.{Files, Paths}

class EtlSpec extends SparkSpec {

  test("full O1-O10 pipeline on sf0.001 lineitem: load, gate, cleanup") {
    val root = Scratch.fresh("etl-spec")
    val (run, fq) = Etl.pipeline(spark, root, sf("lineitem"),
      orderBy = Seq("l_orderkey", "l_linenumber"),
      database = "graft_test", table = "etl_smoke")
    assert(run.succeeded, s"failed=${run.failed} skipped=${run.skipped}")
    assert(spark.table(fq).count() == 100)
    // O10 cleanup removed the zones after the gate passed
    assert(!Files.exists(Paths.get(s"$root/landing")))
    assert(!Files.exists(Paths.get(s"$root/curated")))
  }

  test("a failing source skips downstream tasks but not shared teardown") {
    val root = Scratch.fresh("etl-bad")
    val (run, _) = Etl.pipeline(spark, root, s"$root/missing.parquet",
      orderBy = Seq("x"), database = "graft_test", table = "etl_bad")
    assert(!run.succeeded)
    assert(run.failed == Seq("stage_source"))
    assert(run.skipped.toSet ==
      Set("ingest", "submit_job", "job_sensor", "sql_transform",
        "load_table", "count_check", "cleanup"))
  }
}
