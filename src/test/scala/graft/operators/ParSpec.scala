package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParSpec extends SparkSpec {

  private def docs = spark.read.parquet(sf("documents"))

  test("spread repartitions a small single-file scan to cluster parallelism") {
    val out = Par.spread(docs)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("spread is an identity on plans that already shuffle") {
    val agg = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    assert(Par.spread(agg) eq agg)
    val joined = docs.as("a").join(docs.as("b"), "doc_id")
    assert(Par.spread(joined) eq joined)
    val sorted = docs.orderBy("doc_id")
    assert(Par.spread(sorted) eq sorted)
  }

  test("spread is an identity when the scan estimate is already parallel") {
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1b") // 594 KB file -> ~600k estimated splits
      val d = docs
      assert(Par.spread(d) eq d)
    } finally spark.conf.set(key, prev)
  }

  test("the spread decision runs zero Spark jobs (plan-only, even with AQE)") {
    // Regression guard: df.rdd on an AQE plan materializes every upstream
    // exchange as real jobs whose results are thrown away. The decision
    // must come from the logical plan alone.
    val composite = docs.as("a")
      .join(docs.groupBy("lang").agg(count(lit(1)).as("n")), "lang")
      .orderBy("doc_id")
    val sc = spark.sparkContext
    sc.setJobGroup("par-spread-probe", "spread must plan, not run")
    try Par.spread(composite)
    finally sc.clearJobGroup()
    Thread.sleep(500) // status store is eventually consistent
    val jobs = sc.statusTracker.getJobIdsForGroup("par-spread-probe")
    assert(jobs.isEmpty, s"spread() launched jobs: ${jobs.toSeq}")
  }
}
