package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval: inclusive bounds, per-key isolation, multi-bucket spans") {
    val points = Seq(
      (1L, 100L, "p1"), (1L, 150L, "p2"), (1L, 151L, "p3"),
      (2L, 100L, "p4")) // other key
      .toDF("k", "ms", "tag")
    val intervals = Seq(
      (1L, 100L, 150L, "i1"),   // inclusive both ends; spans 2+ buckets at 40ms
      (1L, 500L, 600L, "i2"),
      (2L, 90L, 110L, "i3"))
      .toDF("k", "s", "e", "iv")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "ms", "s", "e", bucketMs = 40L)
      .select("tag", "iv").as[(String, String)].collect().toSet
    assert(out == Set(("p1", "i1"), ("p2", "i1"), ("p4", "i3")))
  }

  test("pointInInterval matches the naive theta join exactly on events") {
    val ev = graft.model.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ms", unix_millis(col("ts")))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("cid"), $"ms")
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("pid"),
        ($"ms" - 900000L).as("s"), ($"ms" + 900000L).as("e"))
    val bucketed = RangeJoin.pointInInterval(clicks, purch, Seq("user_id"),
        "ms", "s", "e", bucketMs = 1800000L)
      .select("cid", "pid").as[(Long, Long)].collect().toSet
    val naive = clicks.join(purch, Seq("user_id"))
      .filter($"ms" >= $"s" && $"ms" <= $"e")
      .select("cid", "pid").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(bucketed.nonEmpty, "fixture should produce at least one match")
  }

  test("pointInInterval plans an equijoin, never a nested loop") {
    val points = Seq((1L, 100L)).toDF("k", "ms")
    val intervals = Seq((1L, 50L, 150L)).toDF("k", "s", "e")
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "ms", "s", "e", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"must stay an equijoin:\n$plan")
  }

  test("intervalOverlap: each overlapping pair exactly once, long spans included") {
    // i1 [0,100] overlaps j1 [90,300] (shares buckets 2,3,...) and
    // j2 [100,100] (touching endpoints count); i2 [500,600] overlaps j1
    // only via j1's long tail; i3 is disjoint from everything.
    val l = Seq(("i1", 0L, 100L), ("i2", 500L, 600L), ("i3", 900L, 950L))
      .toDF("li", "sa", "ea")
    val r = Seq(("j1", 90L, 600L), ("j2", 100L, 100L))
      .toDF("ri", "sb", "eb")
    val out = RangeJoin.intervalOverlap(l, r, Seq.empty,
        "sa", "ea", "sb", "eb", bucket = 40L)
      .select("li", "ri").as[(String, String)].collect().toList
    assert(out.sorted == List(("i1", "j1"), ("i1", "j2"), ("i2", "j1")))
    // exactly once each — the first-shared-bucket filter dedupes without
    // a distinct
    assert(out.size == out.toSet.size)
  }

  test("intervalOverlap matches the naive theta join on events intervals") {
    val iv = graft.model.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", to_date($"ts").as("d"), unix_millis($"ts").as("ms"))
      .groupBy("user_id", "d").agg(min("ms").as("s"), max("ms").as("e"))
    val a = iv.filter($"user_id" % 10 === 3)
      .select($"user_id".as("ua"), $"s".as("sa"), $"e".as("ea"))
    val b = iv.filter($"user_id" % 10 === 7)
      .select($"user_id".as("ub"), $"s".as("sb"), $"e".as("eb"))
    val bucketed = RangeJoin.intervalOverlap(a, b, Seq.empty,
        "sa", "ea", "sb", "eb", bucket = 21600000L)
      .select("ua", "sa", "ub", "sb").as[(Long, Long, Long, Long)]
      .collect().sorted.toList
    val naive = a.join(b, $"sa" <= $"eb" && $"sb" <= $"ea")
      .select("ua", "sa", "ub", "sb").as[(Long, Long, Long, Long)]
      .collect().sorted.toList
    assert(bucketed == naive)
    assert(bucketed.nonEmpty, "fixture should produce at least one overlap")
  }

  test("intervalOverlap plans an equijoin, never a nested loop") {
    val l = Seq((1L, 0L, 10L)).toDF("k", "sa", "ea")
    val r = Seq((1L, 5L, 15L)).toDF("k", "sb", "eb")
    val plan = RangeJoin.intervalOverlap(l, r, Seq("k"),
        "sa", "ea", "sb", "eb", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"must stay an equijoin:\n$plan")
  }
}
