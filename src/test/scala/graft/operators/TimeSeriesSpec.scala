package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("downsampleOhlc: first/last by (ts, ord), exact extremes and sum") {
    val events = Seq(
      (1L, ts("2026-01-01 10:05:00"), 3.0, 1L),  // open of day 1, key 1
      (1L, ts("2026-01-01 18:00:00"), 1.0, 2L),  // low
      (1L, ts("2026-01-01 23:59:00"), 5.0, 3L),  // close + high
      (1L, ts("2026-01-02 00:01:00"), 8.0, 4L),  // new bucket
      (2L, ts("2026-01-01 12:00:00"), 4.0, 5L),  // tie on ts: ord decides
      (2L, ts("2026-01-01 12:00:00"), 6.0, 6L)
    ).toDF("k", "ts", "value", "event_id")
    val out = TimeSeries.downsampleOhlc(events, "k", "ts", "value",
        "event_id", unit = "day")
      .orderBy("k", "bucket")
      .select("k", "open", "high", "low", "close", "n", "sum_v")
      .as[(Long, Double, Double, Double, Double, Long, Double)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 3.0, 5.0, 1.0, 5.0, 3L, 9.0),
      (1L, 8.0, 8.0, 8.0, 8.0, 1L, 8.0),
      (2L, 4.0, 6.0, 4.0, 6.0, 2L, 10.0)))
  }

  test("resampleFfill: grid per key span, last-in-bucket wins, gaps filled") {
    val events = Seq(
      (1L, ts("2026-01-01 10:05:00"), 1.0, 1L),
      (1L, ts("2026-01-01 10:40:00"), 2.0, 2L), // same hour, later → wins
      (1L, ts("2026-01-01 13:10:00"), 9.0, 3L), // 11:00 and 12:00 are gaps
      (2L, ts("2026-01-01 00:00:00"), 7.0, 4L)  // single-bucket key
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleFfill(events, "user_id", "ts", "value",
        "event_id", unit = "hour", step = "interval 1 hour")
      .orderBy("user_id", "bucket")
      .select("user_id", "value").as[(Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 2.0), (1L, 2.0), (1L, 2.0), (1L, 9.0), // 10,11,12,13
      (2L, 7.0)))
  }

  test("interpolate: linear between anchors, backfill head, ffill tail") {
    val events = Seq(
      (1L, ts("2026-01-01 10:30:00"), 10.0, 1L),
      (1L, ts("2026-01-01 12:30:00"), 30.0, 2L),
      (2L, ts("2026-01-01 05:00:00"), 4.0, 3L), // anchor exactly on grid
      (2L, ts("2026-01-01 07:00:00"), 8.0, 4L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.interpolate(events, "user_id", "ts", "value",
        "event_id", unit = "hour", step = "interval 1 hour")
      .orderBy("user_id", "bucket")
      .select("user_id", "value").as[(Long, Double)].collect().toSeq
    assert(out == Seq(
      // key 1 grid 10:00..12:00 — 10:00 precedes the first anchor
      // (backfill), 11:00 is 1/4 of the 10:30→12:30 segment, 12:00 is 3/4
      (1L, 10.0), (1L, 15.0), (1L, 25.0),
      // key 2 grid 05:00..07:00 — on-anchor hit, midpoint, on-anchor hit
      (2L, 4.0), (2L, 6.0), (2L, 8.0)))
  }

  test("interpolate: same-ts anchors dedup to highest ord; single-anchor key") {
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1.0, 1L),
      (1L, ts("2026-01-01 10:00:00"), 5.0, 2L), // wins the 10:00 anchor
      (1L, ts("2026-01-01 11:00:00"), 7.0, 3L),
      (3L, ts("2026-01-01 09:20:00"), 2.0, 4L)  // grid = the single 09:00
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.interpolate(events, "user_id", "ts", "value",
        "event_id", unit = "hour", step = "interval 1 hour")
      .orderBy("user_id", "bucket")
      .select("user_id", "value").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 5.0), (1L, 7.0), (3L, 2.0)))
  }

  test("resampleFfill: same-timestamp tie broken by ordCol") {
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1.0, 5L),
      (1L, ts("2026-01-01 10:00:00"), 2.0, 9L) // higher ord → wins
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleFfill(events, "user_id", "ts", "value",
        "event_id", unit = "hour", step = "interval 1 hour")
      .select("value").as[Double].collect().toSeq
    assert(out == Seq(2.0))
  }

  test("timeWeightedAvg: gaps weight values; last observation carries none") {
    // value 10 holds 1s, value 20 holds 3s, value 99 is terminal (no
    // weight): twap = (10*1000 + 20*3000)/4000 = 17.5.
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 10.0, 1L),
      (1L, ts("2026-01-01 10:00:01"), 20.0, 2L),
      (1L, ts("2026-01-01 10:00:04"), 99.0, 3L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.timeWeightedAvg(events, "user_id", "ts", "value",
        "event_id").as[(Long, Double, Long)].collect().toSeq
    assert(out == Seq((1L, 17.5, 4000L)))
  }

  test("timeWeightedAvg: single-instant keys are dropped, ties broken by ord") {
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 5.0, 1L), // all at one instant
      (1L, ts("2026-01-01 10:00:00"), 6.0, 2L),
      (2L, ts("2026-01-01 10:00:00"), 1.0, 1L),
      (2L, ts("2026-01-01 10:00:02"), 3.0, 2L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.timeWeightedAvg(events, "user_id", "ts", "value",
        "event_id").as[(Long, Double, Long)].collect().toSeq
    assert(out == Seq((2L, 1.0, 2000L)))
  }

  test("ewmaTruncated: dyadic blend by hand, warm-start repeats oldest value") {
    val events = (1 to 5).map(i =>
      (1L, ts(f"2026-01-01 10:0$i:00"), Seq(16.0, 8.0, 4.0, 2.0, 1.0)(i - 1),
        i.toLong))
      .toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.ewmaTruncated(events, "user_id", "ts", "value",
        "event_id")
      .orderBy("event_id").select("ewma").as[Double].collect().toSeq
    // 16: full warm start; then 8/2+16/4+16/8+16/8, 4/2+8/4+16/8+16/8,
    // 2/2+4/4+8/8+16/8, 1/2+2/4+4/8+8/8
    assert(out == Seq(16.0, 12.0, 8.0, 5.0, 2.5))
  }

  test("rollingInterval: trailing frame drops expired rows; ties share a frame") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 1L),
      (1L, ts("2024-01-01 10:30:00"), 2.0, 2L),
      // exactly 1h after the first row: still inside [t-1h, t]
      (1L, ts("2024-01-01 11:00:00"), 4.0, 3L),
      // same ms as event 3 -> same frame for both peer rows
      (1L, ts("2024-01-01 11:00:00"), 8.0, 4L),
      // first row (10:00) now expired
      (1L, ts("2024-01-01 11:15:00"), 16.0, 5L),
      (2L, ts("2024-01-01 10:45:00"), 32.0, 6L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.rollingInterval(events, "user_id", "ts", "value",
        widthMs = 3600000L)
      .orderBy("event_id").select("n_win", "sum_win")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1.0), (2L, 3.0), (4L, 15.0), (4L, 15.0),
      (4L, 30.0), (1L, 32.0)))
  }

  test("maseNaive: hand-computed skill ratio; constant baseline gives null") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0), ("a", 5L, 5.0),
      ("c", 1L, 3.0), ("c", 2L, 3.0), ("c", 3L, 3.0)).toDF("k", "t", "v")
    val out = TimeSeries.maseNaive(df, Seq("k"), Seq("t"), "v",
        season = 2, grid = 1L)
      .as[(String, Long, Option[Long], Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // err_s = |3-1|+|4-2|+|5-3| = 6 over 3 pairs; err_1 = 4 over 4 pairs.
    assert(out("a")._2 == 5L && out("a")._3 == Some(6L) &&
      out("a")._4 == Some(4L))
    assert(out("a")._5 == Some((6.0 * 4) / (4.0 * 3)))
    assert(out("c")._5.isEmpty) // constant series: baseline error 0
  }

  test("maseNaive: a perfectly seasonal series scores 0 (beats the baseline)") {
    val xs = (0 until 24).map(i => ("s", i.toLong, (i % 4).toDouble))
    val out = TimeSeries.maseNaive(xs.toDF("k", "t", "v"), Seq("k"),
        Seq("t"), "v", season = 4, grid = 1L)
      .as[(String, Long, Option[Long], Option[Long], Option[Double])].head()
    assert(out._3 == Some(0L) && out._5 == Some(0.0))
  }

  test("seasonalIndex: hand-computed ratios; zero-sum key is null") {
    // k: slot 1 holds {1, 2} (mean 1.5), slot 2 holds {6} (mean 6);
    // overall mean 3 -> idx 0.5 and 2.0. z: all zeros -> null idx.
    val rows = Seq(("k", 1L, 1.0), ("k", 1L, 2.0), ("k", 2L, 6.0),
      ("z", 1L, 0.0), ("z", 2L, 0.0))
    def run(d: org.apache.spark.sql.DataFrame) =
      TimeSeries.seasonalIndex(d, Seq("k"), col("slot"), "v", grid = 1L)
        .as[(String, Long, Long, Option[Double])].collect().toSet
    val got = run(rows.toDF("k", "slot", "v"))
    assert(got == Set(("k", 1L, 2L, Some(0.5)), ("k", 2L, 1L, Some(2.0)),
      ("z", 1L, 1L, None), ("z", 2L, 1L, None)))
    assert(got == run(rows.toDF("k", "slot", "v").repartition(7)))
  }
}
