package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

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
}
