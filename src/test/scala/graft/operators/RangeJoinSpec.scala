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
}
