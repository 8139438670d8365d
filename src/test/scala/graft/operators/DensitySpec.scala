package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DensitySpec extends SparkSpec {
  import spark.implicits._

  private def pts(xs: (Long, Seq[Double])*) =
    xs.toSeq.toDF("id", "pt")

  private def run(df: org.apache.spark.sql.DataFrame, eps: Double,
                  minPts: Int): Map[Long, (Long, Boolean)] =
    Density.dbscan(df, "id", "pt", eps, minPts)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, c, core) => id -> (c, core) }.toMap

  test("chain: interior cores, end borders, small groups and isolates are noise") {
    // Chain spaced 0.05 with eps 0.06, minPts 3: interior points have 2
    // neighbors (core), ends 1 (border of the adjacent core). The far
    // 2-point group never reaches minPts and neighbors no core -> noise;
    // the isolate is noise.
    val df = pts(
      1L -> Seq(0.00, 0.0), 2L -> Seq(0.05, 0.0),
      3L -> Seq(0.10, 0.0), 4L -> Seq(0.15, 0.0),
      5L -> Seq(5.00, 5.0), 6L -> Seq(5.04, 5.0),
      7L -> Seq(10.0, 10.0))
    val out = run(df, eps = 0.06, minPts = 3)
    assert(out == Map(
      2L -> (2L, true), 3L -> (2L, true),
      1L -> (2L, false), 4L -> (2L, false)))
  }

  test("neighbors across a grid-cell boundary are found") {
    // 0.059 and 0.061 land in different eps-cells but are 0.002 apart.
    val df = pts(1L -> Seq(0.059, 0.0), 2L -> Seq(0.061, 0.0))
    val out = run(df, eps = 0.06, minPts = 2)
    assert(out == Map(1L -> (1L, true), 2L -> (1L, true)))
  }

  test("distance runs over ALL dimensions, not just the two grid axes") {
    // Identical in the first two dims, far apart in the third.
    val df = pts(
      1L -> Seq(0.0, 0.0, 0.0), 2L -> Seq(0.01, 0.0, 0.0),
      3L -> Seq(0.0, 0.0, 5.0))
    val out = run(df, eps = 0.06, minPts = 2)
    assert(out == Map(1L -> (1L, true), 2L -> (1L, true)))
  }

  test("two separated clusters get distinct min-id labels; border takes the min cluster") {
    // Two 4-point squares (side 0.03, diag 0.042 — all mutually within
    // eps 0.05, so all 8 are core at minPts 4) 0.09 apart: never merge.
    // Point 5 at (0.075, 0) is 0.045 from one core of EACH square but has
    // only those 2 neighbors (+1 = 3 < 4): a border — assigned the min
    // cluster id among its core neighbors, here cluster 1.
    val df = pts(
      1L -> Seq(0.00, 0.0), 2L -> Seq(0.03, 0.0),
      3L -> Seq(0.00, 0.03), 4L -> Seq(0.03, 0.03),
      10L -> Seq(0.12, 0.0), 11L -> Seq(0.15, 0.0),
      12L -> Seq(0.12, 0.03), 13L -> Seq(0.15, 0.03),
      5L -> Seq(0.075, 0.0))
    val out = run(df, eps = 0.05, minPts = 4)
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == (1L, true)), s"$out")
    assert(Seq(10L, 11L, 12L, 13L).forall(out(_) == (10L, true)), s"$out")
    assert(out(5L) == (1L, false), s"border of min cluster: $out")
  }

  test("deterministic under repartitioning") {
    val base = (0L until 200L).map(i =>
      i -> Seq((i % 40).toDouble * 0.03, (i / 40).toDouble * 0.25))
    val a = run(pts(base: _*).repartition(13), eps = 0.05, minPts = 3)
    val b = run(pts(base: _*).repartition(1), eps = 0.05, minPts = 3)
    assert(a == b && a.nonEmpty)
  }

  test("negative coordinates block correctly (floor, not truncate)") {
    val df = pts(1L -> Seq(-0.01, 0.0), 2L -> Seq(0.01, 0.0))
    val out = run(df, eps = 0.06, minPts = 2)
    assert(out == Map(1L -> (1L, true), 2L -> (1L, true)))
  }
}
