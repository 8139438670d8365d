package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function tests for the bench artifact machinery (VERDICT r12 #3):
  * the re-fork valve's two triggers and the tolerant previous-artifact
  * median extraction the drift trigger feeds on. No Spark session.
  */
class BenchSpec extends AnyFunSuite {

  test("median and spread basics") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(1.0, 2.0, 3.0, 4.0)) == 2.5)
    assert(Bench.spread(Seq(2.0, 2.0, 2.0)) == 0.0)
    assert(math.abs(Bench.spread(Seq(1.0, 2.0, 3.0)) - 1.0) < 1e-12)
  }

  test("refork valve: within-run spread trigger") {
    assert(Bench.reforkReason("x8_bfs", Seq(1.0, 2.0, 1.1), None)
      .contains("spread"))
    assert(Bench.reforkReason("x8_bfs", Seq(1.0, 1.1, 1.2), None).isEmpty)
  }

  test("refork valve fires on cross-round drift (the r12 x8 blind spot)") {
    // r12 shape: x8_ktruss 17.8 s vs r11's 8.46 s with within-run spread
    // 0.33 — the spread valve alone never fired. Drift must.
    val runs = Seq(17.0, 17.8, 19.5) // spread ~0.14, well under 0.5
    assert(Bench.reforkReason("x8_ktruss", runs, Some(8.46))
      .contains("drift"))
    // Same runs with an in-band previous median: no refork.
    assert(Bench.reforkReason("x8_ktruss", runs, Some(15.0)).isEmpty)
    // No previous artifact: valve silent (safe failure mode).
    assert(Bench.reforkReason("x8_ktruss", runs, None).isEmpty)
    // Spread trigger outranks drift (one retry, calmer-kept semantics).
    assert(Bench.reforkReason("x8_ktruss", Seq(5.0, 30.0, 6.0), Some(8.46))
      .contains("spread"))
  }

  test("calibration lines never re-fork: they record raw weather") {
    // Re-forking a calibration and keeping the calmer attempt biases the
    // noise estimate toward calm — the opposite of its purpose.
    for (cal <- Bench.calibrationNames) {
      assert(Bench.reforkReason(cal, Seq(1.0, 9.0, 1.1), None).isEmpty)
      assert(Bench.reforkReason(cal, Seq(9.0, 9.1, 9.2), Some(1.0)).isEmpty)
    }
  }

  test("prevMedians: r12-shaped escaped, front-truncated artifact") {
    // Mimics BENCH_r12.json: the bench stdout embedded as an ESCAPED
    // string, truncated at the FRONT mid-queries-object, with the same
    // query names recurring in the variance region with small values.
    val artifact =
      """{"n": 12, "rc": 0, "sf": 0.1,
        | "tail": "eam_merge\":1.735,\"q1_agg\":0.525,\"x8_ktruss\":17.807,\"x8_sssp\":5.385},\"variance\":{\"q1_agg\":0.244,\"x8_ktruss\":0.326},\"runs\":3,\"sf\":\"sf0.1\"}\n[success]",
        | "parsed": null}""".stripMargin
    val known = Set("q1_agg", "x8_ktruss", "x8_sssp")
    val m = Bench.prevMedians(artifact, "sf0.1", known.contains)
    assert(m == Map("q1_agg" -> 0.525, "x8_ktruss" -> 17.807,
      "x8_sssp" -> 5.385))
    // Unknown names (truncation fragments, top-level keys) are dropped.
    assert(!m.contains("eam_merge"))
    // Variance values must NOT leak in as medians (q1_agg stayed 0.525,
    // not 0.244) — the cut at the first "variance" marker guarantees it.
  }

  test("prevMedians: sf mismatch yields empty (never cross-sf drift)") {
    val artifact =
      """{"sf": 1.0, "tail": "{\"metric\":\"bench_total\",\"queries\":{\"q1_agg\":1.117},\"sf\":\"sf1\"}"}"""
    assert(Bench.prevMedians(artifact, "sf0.1", _ => true).isEmpty)
    assert(Bench.prevMedians(artifact, "sf1", _ => true)
      .get("q1_agg").contains(1.117))
  }

  test("prevMedians: garbage input is the safe empty map") {
    assert(Bench.prevMedians("", "sf0.1", _ => true).isEmpty)
    assert(Bench.prevMedians("not json at all", "sf0.1", _ => true).isEmpty)
  }

  test("prevMedians: anchored sf number never matches a larger sf (ADVICE r13)") {
    // An sf10 (or sf1.5) artifact must NOT seed an sf1 run's drift
    // baseline: the old raw substring check for "sf": 1 matched both.
    val sf10 = """{"sf": 10, "tail": "{\"queries\":{\"q1_agg\":9.99},\"sf\":\"sf10\"}"}"""
    assert(Bench.prevMedians(sf10, "sf1", _ => true).isEmpty)
    val sf15 = """{"sf": 1.5, "tail": "{\"queries\":{\"q1_agg\":9.99}}"}"""
    assert(Bench.prevMedians(sf15, "sf1", _ => true).isEmpty)
    // The genuine sf1 forms still match: quoted label, bare int, x.0.
    val sf1a = """{"sf": 1, "tail": "{\"queries\":{\"q1_agg\":1.117}}"}"""
    assert(Bench.prevMedians(sf1a, "sf1", _ => true)
      .get("q1_agg").contains(1.117))
    val sf1b = """{"sf": 1.0, "tail": "{\"queries\":{\"q1_agg\":1.117}}"}"""
    assert(Bench.prevMedians(sf1b, "sf1", _ => true)
      .get("q1_agg").contains(1.117))
  }

  test("prevMedians: pretty-printed label form matches (r14 sf1 valve miss)") {
    // The regenerated BENCH_sf1.json is pretty-printed JSON with a space
    // after the colon; the first anchored-label check required "sf":"sf1"
    // verbatim and silently handed the drift valve an empty baseline.
    val pretty = """{ "queries": {"q1_agg": 1.117, "x8_bfs": 10.83}, "sf": "sf1" }"""
    assert(Bench.prevMedians(pretty, "sf1", _ => true) ==
      Map("q1_agg" -> 1.117, "x8_bfs" -> 10.83))
    // ... while still never matching a larger sf label.
    val pretty10 = """{ "queries": {"q1_agg":9.99}, "sf": "sf10" }"""
    assert(Bench.prevMedians(pretty10, "sf1", _ => true).isEmpty)
  }

  test("compact line: full current bench set + 8 growth lines fits the cap") {
    // The r11/r12 truncation class re-breaks silently the moment the
    // queries map outgrows the cap — this pins headroom: every benched
    // gate TODAY plus 8 hypothetical additions, worst-case widths
    // (4-digit medians, both calibrations, a failed entry), must fit.
    val names = SparkEntry.benchNames ++
      (1 to 8).map(i => f"x9_future_gate_name_$i%02d")
    val medians = names.map(n => n -> 9999.99)
    val line = Bench.compactLine(total = 99999.999, medians,
      runs = 3, isolation = "jvm", cal = "q1_agg", calIo = "s13_io_cal",
      failedJson = "[\"x9_future_gate_name_08\"]", sfLabel = "sf0.01")
    assert(line.contains("\"queries\":{"),
      s"queries map dropped — compact line ${line.length} chars > cap " +
        s"${Bench.CompactCap} with ${names.size} entries")
    assert(line.length <= Bench.CompactCap)
    // And the cap itself leaves the driver's 2000-char window room for
    // sbt's [success] trailer.
    assert(Bench.CompactCap <= 1800)
  }
}
