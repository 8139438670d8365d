package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "s", "v")

  test("upsert: updates replace, inserts append, rest survive") {
    val updates = Seq((2L, "B", 21.0), (9L, "new", 90.0)).toDF("k", "s", "v")
    val out = Snapshot.upsert(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "B", 21.0), (3L, "c", 30.0),
      (9L, "new", 90.0)))
  }

  test("upsert plans one shuffle on the key") {
    val updates = Seq((2L, "B", 21.0)).toDF("k", "s", "v")
    val plan = Snapshot.upsert(base, updates, Seq("k"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("scd2: runs become versions with abutting validity") {
    val events = Seq(
      (1L, "x", 100L, 1L), (1L, "x", 200L, 2L), (1L, "y", 300L, 3L),
      (1L, "x", 400L, 4L), (2L, "z", 150L, 5L)
    ).toDF("user_id", "state", "ts", "event_id")
    val out = Snapshot.scd2(events, "user_id", "state", "ts", "event_id")
      .orderBy("user_id", "version")
      .select("user_id", "state", "valid_from", "valid_to", "version",
        "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4),
        r.getBoolean(5))).toSeq
    assert(out == Seq(
      (1L, "x", 100L, Some(300L), 1, false),
      (1L, "y", 300L, Some(400L), 2, false),
      (1L, "x", 400L, None, 3, true),
      (2L, "z", 150L, None, 1, true)))
  }

  test("scd2 ties broken by ordCol — same ts, two events, stable versions") {
    val events = Seq(
      (1L, "a", 100L, 2L), (1L, "b", 100L, 1L)
    ).toDF("user_id", "state", "ts", "event_id")
    val out = Snapshot.scd2(events, "user_id", "state", "ts", "event_id")
      .orderBy("version").select("state").as[String].collect().toSeq
    assert(out == Seq("b", "a"))
  }

  test("diff: I/U/D classified, unchanged keys dropped, D keeps before image") {
    val after = Seq(
      (1L, "a", 10.0),          // unchanged -> dropped
      (2L, "b", 25.0),          // value change -> U
      (9L, "new", 90.0)         // new key -> I  (key 3 deleted -> D)
    ).toDF("k", "s", "v")
    val out = Snapshot.diff(base, after, Seq("k"))
      .orderBy("k").as[(String, Long, String, Double)].collect().toSeq
    assert(out == Seq(("U", 2L, "b", 25.0), ("D", 3L, "c", 30.0),
      ("I", 9L, "new", 90.0)))
  }

  test("diff: null KEY rows match null-safely, not as perpetual inserts") {
    val b = Seq((Option(1L), "a"), (Option.empty[Long], "x")).toDF("k", "s")
    val unchanged = Snapshot.diff(b, b, Seq("k"))
    assert(unchanged.count() == 0)
    val a = Seq((Option(1L), "a"), (Option.empty[Long], "y")).toDF("k", "s")
    val out = Snapshot.diff(b, a, Seq("k"))
      .as[(String, Option[Long], String)].collect().toSeq
    assert(out == Seq(("U", None, "y")))
  }

  test("diff treats null data values null-safely") {
    val b = Seq((1L, Option("a")), (2L, Option.empty[String])).toDF("k", "s")
    val a = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val out = Snapshot.diff(b, a, Seq("k"))
      .as[(String, Long, Option[String])].collect().toSeq
    assert(out == Seq(("U", 1L, None))) // null==null is NOT a change
  }

  private def facts = Seq(
    (1L, "x", 1.25), (1L, "y", 2.50), (2L, "x", 10.00),
    (2L, "y", 0.75), (3L, "z", 5.00)
  ).toDF("k", "tag", "v")

  test("aggPartials + mergePartials over a split equals the full aggregate") {
    val sums = Seq("total" -> "v")
    val full = Snapshot.aggPartials(facts, Seq("k"), sums)
    val merged = Snapshot.mergePartials(
      Snapshot.aggPartials(facts.filter($"tag" === "x"), Seq("k"), sums),
      Snapshot.aggPartials(facts.filter($"tag" =!= "x"), Seq("k"), sums),
      Seq("k"))
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"k", $"cnt", $"total".cast("double"))
        .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(canon(merged) == canon(full))
  }

  test("mergePartials with an empty delta is the identity") {
    val sums = Seq("total" -> "v")
    val baseAgg = Snapshot.aggPartials(facts, Seq("k"), sums)
    val out = Snapshot.mergePartials(baseAgg,
      Snapshot.aggPartials(facts.filter($"k" < 0), Seq("k"), sums), Seq("k"))
    assert(out.select($"k", $"cnt", $"total".cast("double"))
        .as[(Long, Long, Double)].collect().toSeq.sorted ==
      baseAgg.select($"k", $"cnt", $"total".cast("double"))
        .as[(Long, Long, Double)].collect().toSeq.sorted)
  }

  test("mergePartials keeps delta-only keys") {
    val sums = Seq("total" -> "v")
    val out = Snapshot.mergePartials(
      Snapshot.aggPartials(facts.filter($"k" <= 2), Seq("k"), sums),
      Snapshot.aggPartials(facts.filter($"k" === 3), Seq("k"), sums),
      Seq("k"))
    assert(out.filter($"k" === 3).select($"cnt").as[Long].collect().toSeq
      == Seq(1L))
  }

  test("upsertEvolve: by-name union schema, nulls for missing, updates win") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val upd = Seq((2L, "B", 9L), (3L, "C", 7L)).toDF("k", "v", "extra")
    val out = Snapshot.upsertEvolve(base, upd, Seq("k"))
      .as[(Long, String, Option[Long])].collect().toSet
    assert(out == Set((1L, "a", None), (2L, "B", Some(9L)),
      (3L, "C", Some(7L))))
    // Reverse direction: update drops a column the base has.
    val out2 = Snapshot.upsertEvolve(upd, base, Seq("k"))
      .select("k", "v", "extra")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(out2 == Set((2L, "b", None), (3L, "C", Some(7L)),
      (1L, "a", None)))
  }
}
