package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val KEY = "spark.graft.rangeJoin.bucket"

  private def withBucket[A](ms: Long)(f: => A): A = {
    spark.conf.set(KEY, ms.toString)
    try f finally spark.conf.unset(KEY)
  }

  private def points = Seq((1L, 100L), (2L, 150L), (3L, 151L), (4L, 700L))
    .toDF("pid", "ms")
  private def intervals = Seq((10L, 100L, 150L), (11L, 500L, 800L))
    .toDF("iid", "s", "e")

  private def thetaJoin = points.join(intervals,
    $"ms" >= $"s" && $"ms" <= $"e")

  test("rewrites the pure range join: no nested loop, same rows") {
    val off = thetaJoin.queryExecution.executedPlan.toString
    assert(off.contains("NestedLoop"),
      s"precondition: Spark plans the theta join as BNLJ\n$off")
    withBucket(40L) {
      val plan = thetaJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), s"must become an equijoin:\n$plan")
      assert(plan.contains("Generate"), "interval side must explode buckets")
      val got = thetaJoin.select("pid", "iid").as[(Long, Long)]
        .collect().toSet
      assert(got == Set((1L, 10L), (2L, 10L), (4L, 11L)))
    }
  }

  test("each qualifying pair appears exactly once (long interval spans)") {
    withBucket(10L) { // interval 11 spans ~30 buckets
      val got = thetaJoin.select("pid", "iid").as[(Long, Long)]
        .collect().toList
      assert(got.size == got.toSet.size, s"duplicated pairs: $got")
      assert(got.toSet == Set((1L, 10L), (2L, 10L), (4L, 11L)))
    }
  }

  test("SQL BETWEEN goes through the same rewrite") {
    withBucket(40L) {
      points.createOrReplaceTempView("pts")
      intervals.createOrReplaceTempView("ivs")
      val df = spark.sql(
        "SELECT pid, iid FROM pts JOIN ivs ON ms BETWEEN s AND e")
      assert(!df.queryExecution.executedPlan.toString.contains("NestedLoop"))
      assert(df.as[(Long, Long)].collect().toSet ==
        Set((1L, 10L), (2L, 10L), (4L, 11L)))
    }
  }

  test("equi-join conditions are left alone (already hash-joinable)") {
    val keyedPts = points.withColumn("k", $"pid" % 2)
    val keyedIvs = intervals.withColumn("k", $"iid" % 2)
    val j = keyedPts.join(keyedIvs,
      keyedPts("k") === keyedIvs("k") && $"ms" >= $"s" && $"ms" <= $"e")
    withBucket(40L) {
      val plan = j.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_ib"), s"must not rewrite:\n$plan")
    }
  }

  test("rule off by default: conf unset leaves plans untouched") {
    val plan = thetaJoin.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_ib"))
  }

  test("malformed conf value fails with a message naming the key") {
    spark.conf.set(KEY, "30 minutes")
    try {
      val ex = intercept[Exception] { thetaJoin.collect() }
      // The cause chain must carry the named-key message, not a bare
      // NumberFormatException from inside the optimizer.
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains(KEY), s"error must name the conf key: $msgs")
    } finally spark.conf.unset(KEY)
  }

  test("gate r10_range_rule leaves the session conf unset") {
    val df = graft.SparkEntry.queries("r10_range_rule")(
      spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
    assert(spark.conf.getOption(KEY).isEmpty,
      "gate must not leave the rewrite rule armed session-wide")
    // The eager materialization leaves checkpoint blocks; drop them the
    // way Bench/Verify do so later specs see a clean block manager.
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("matches the nested-loop result on the events fixture") {
    val ev = graft.model.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ms", unix_millis($"ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("cid"), $"ms")
    val windows = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("pid"),
        ($"ms" - 900000L).as("s"), ($"ms" + 900000L).as("e"))
    def run() = clicks.join(windows, $"ms" >= $"s" && $"ms" <= $"e")
      .select("cid", "pid").as[(Long, Long)].collect().toSet
    val naive = run()
    val rewritten = withBucket(1800000L)(run())
    assert(rewritten == naive)
    assert(naive.nonEmpty)
  }
}
