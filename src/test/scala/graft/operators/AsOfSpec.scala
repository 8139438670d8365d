package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("joinAsOf: inclusive <=, per-key isolation, null when no prior row") {
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), "l1"),
      (1L, ts("2026-01-01 12:00:00"), "l2"),
      (2L, ts("2026-01-01 11:00:00"), "l3"),
      (3L, ts("2026-01-01 11:00:00"), "l4")) // key with no right rows
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 09:00:00"), 9.0),
      (1L, ts("2026-01-01 12:00:00"), 12.0), // equal ts → matched (<=)
      (2L, ts("2026-01-01 11:30:00"), 99.0)) // after l3 → not matched
      .toDF("k", "ts", "v")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "l1" -> Some(9.0), "l2" -> Some(12.0), "l3" -> None, "l4" -> None))
  }

  test("joinAsOf: multi-column payload comes from the SAME matched row") {
    val left = Seq((1L, ts("2026-01-01 10:00:00"))).toDF("k", "ts")
    val right = Seq(
      (1L, ts("2026-01-01 08:00:00"), Some("a"), Some(1.0)),
      (1L, ts("2026-01-01 09:00:00"), None: Option[String], Some(2.0)))
      .toDF("k", "ts", "s", "v")
    // latest row has s = null; a per-column last(ignoreNulls) would
    // resurrect "a" from the older row — the struct transport must not
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts", Seq("s", "v"))
      .select("s", "v").as[(Option[String], Option[Double])].head()
    assert(out == (None, Some(2.0)))
  }

  test("joinAsOf: rightOrder breaks equal-timestamp ties deterministically") {
    val left = Seq((1L, ts("2026-01-01 10:00:00"))).toDF("k", "ts")
    val right = Seq(
      (1L, ts("2026-01-01 09:00:00"), 5L, "low"),
      (1L, ts("2026-01-01 09:00:00"), 9L, "high"))
      .toDF("k", "ts", "seq", "tag")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts",
      Seq("tag"), rightOrder = Seq("seq"))
    assert(out.select("tag").as[String].head() == "high")
  }

  test("joinAsOf forward: inclusive >=, next row wins, first-under-order tie") {
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), "l1"),
      (1L, ts("2026-01-01 12:00:00"), "l2"), // equal ts → matched (>=)
      (2L, ts("2026-01-01 11:00:00"), "l3")) // no later right row
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 11:00:00"), 11.0),
      (1L, ts("2026-01-01 12:00:00"), 12.0),
      (2L, ts("2026-01-01 10:00:00"), 99.0)) // before l3 → not matched
      .toDF("k", "ts", "v")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts", Seq("v"),
        forward = true)
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(out == Map("l1" -> Some(11.0), "l2" -> Some(12.0), "l3" -> None))
    val tie = AsOf.joinAsOf(
      Seq((1L, ts("2026-01-01 10:00:00"))).toDF("k", "ts"),
      Seq((1L, ts("2026-01-01 11:00:00"), 5L, "low"),
        (1L, ts("2026-01-01 11:00:00"), 9L, "high")).toDF("k", "ts", "seq", "tag"),
      Seq("k"), "ts", "ts", Seq("tag"), rightOrder = Seq("seq"), forward = true)
    assert(tie.select("tag").as[String].head() == "low")
  }

  test("joinAsOfTolerance nulls matches past the staleness bound") {
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), "fresh"),
      (1L, ts("2026-01-03 10:00:00"), "stale"),
      (2L, ts("2026-01-01 10:00:00"), "none"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2026-01-01 09:00:00"), 7.0)).toDF("k", "ts", "v")
    val out = AsOf.joinAsOfTolerance(left, right, Seq("k"), "ts", "ts",
        Seq("v"), toleranceMs = 24L * 3600 * 1000)
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    // 1h-old match survives a 24h bound; the 2-day-old one is nulled;
    // no-match stays null
    assert(out == Map("fresh" -> Some(7.0), "stale" -> None, "none" -> None))
    // still exactly one keyed exchange — the bound is a post-projection
    val plan = AsOf.joinAsOfTolerance(left, right, Seq("k"), "ts", "ts",
      Seq("v"), 1000L).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1)
  }

  test("joinAsOf plans one shuffle on the key (window partition)") {
    val left = Seq((1L, ts("2026-01-01 10:00:00"))).toDF("k", "ts")
    val right = Seq((1L, ts("2026-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    val plan = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one keyed exchange:\n$plan")
    assert(!plan.contains("NestedLoop"), "must not plan a range nested loop")
  }

  test("joinAsOfNearest: closest side wins, tie to the past, edges null") {
    val left = Seq(("k", 9L, 1L), ("k", 14L, 2L), ("k", 15L, 3L),
      ("k", 16L, 4L), ("k", 25L, 5L), ("z", 10L, 6L))
      .toDF("k", "ms", "lid")
    val right = Seq(("k", 10L, "p10"), ("k", 20L, "p20"))
      .toDF("k", "pms", "tag")
    val out = AsOf.joinAsOfNearest(left, right, Seq("k"), "ms", "pms",
        Seq("tag"))
      .select("lid", "tag", "asof_dir")
      .as[(Long, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some("p10"), Some("f")))) // before all -> forward
    assert(out(2L) == ((Some("p10"), Some("b")))) // 4 back vs 6 fwd
    assert(out(3L) == ((Some("p10"), Some("b")))) // 5 == 5 tie -> past
    assert(out(4L) == ((Some("p20"), Some("f")))) // 6 back vs 4 fwd
    assert(out(5L) == ((Some("p20"), Some("b")))) // after all -> backward
    assert(out(6L) == ((None, None)))             // no rights in group
  }

  test("joinAsOfNearest: null right timestamps are no match, not -inf") {
    val left = Seq(("k", 5L)).toDF("k", "ms")
    val right = Seq(("k", Option.empty[Long], "ghost")).toDF("k", "pms", "tag")
    val out = AsOf.joinAsOfNearest(left, right, Seq("k"), "ms", "pms",
        Seq("tag"))
      .select("tag", "asof_dir").as[(Option[String], Option[String])]
      .head()
    assert(out == ((None, None)))
  }

  test("joinAsOfNearest: stays a single keyed exchange") {
    val left = Seq(("k", 5L)).toDF("k", "ms")
    val right = Seq(("k", 3L, 1.0)).toDF("k", "pms", "v")
    val plan = AsOf.joinAsOfNearest(left, right, Seq("k"), "ms", "pms",
        Seq("v")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one keyed exchange:\n$plan")
    assert(!plan.contains("NestedLoop"))
  }
}
