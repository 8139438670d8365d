package graft.checks

import graft.SparkSpec

class CheckSpec extends SparkSpec {

  test("truthiness table matches BigQueryCheckOperator semantics") {
    val c = Check("t", "SELECT 1")
    assert(c.truthy(true) && !c.truthy(false))
    assert(c.truthy(1L) && c.truthy(-1) && !c.truthy(0) && !c.truthy(0.0))
    assert(c.truthy("x") && !c.truthy(""))
    assert(!c.truthy(null))
  }

  test("count(*) > 0 gate passes on non-empty table and fails on empty") {
    spark.read.parquet(sf("region")).createOrReplaceTempView("chk_region")
    assert(Check("nonempty", "SELECT count(*) FROM chk_region").run(spark))
    assert(!Check("empty",
      "SELECT count(*) FROM chk_region WHERE r_regionkey < 0").run(spark))
    // multi-column: one falsy column fails the row
    assert(!Check("mixed", "SELECT 1, 0").run(spark))
    assert(Check("allok", "SELECT 1, 'x', true").run(spark))
  }

  test("assertPasses throws on failure") {
    intercept[IllegalStateException] {
      Check("bad", "SELECT 0").assertPasses(spark)
    }
  }
}
