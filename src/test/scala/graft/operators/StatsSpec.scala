package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: hand-computed buckets, max value clamped into the last") {
    // lo=0, hi=10, 5 buckets of width 2. 10 would floor to bucket 5 —
    // clamped to 4.
    val df = Seq(0.0, 1.9, 2.0, 5.0, 9.9, 10.0).toDF("v")
    val out = Stats.histogram(df, "v", 5).as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 4L -> 2L))
  }

  test("histogram: degenerate constant column lands in bucket 0") {
    val df = Seq(7.5, 7.5, 7.5).toDF("v")
    val out = Stats.histogram(df, "v", 8).as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 3L))
  }

  test("minMaxScale: [0,1] endpoints hit, degenerate group scales to 0") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 15.0),
      ("b", 7.0), ("b", 7.0)).toDF("k", "v")
    val out = Stats.minMaxScale(df, Seq("k"), "v")
      .select($"k", $"v", $"scaled").as[(String, Double, Double)]
      .collect().toSet
    assert(out == Set(("a", 10.0, 0.0), ("a", 20.0, 1.0), ("a", 15.0, 0.5),
      ("b", 7.0, 0.0)))
  }

  test("iqrOutliers: quartiles are order statistics; fences flag by hand") {
    // n=8 sorted: 1,2,3,4,5,6,7,100. q1 = rank ceil(2)=2 → 2;
    // q3 = rank ceil(6)=6 → 6. iqr=4, fences k=1.5: [-4, 12] → 100 out.
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("k", "v", "o")
    val out = Stats.iqrOutliers(df, Seq("k"), "v", "o")
    val flagged = out.filter($"is_outlier").select($"v").as[Double]
      .collect().toSeq
    assert(flagged == Seq(100.0))
    val bounds = out.select($"q1", $"q3").distinct()
      .as[(Double, Double)].head()
    assert(bounds == ((2.0, 6.0)))
  }

  test("topKByCount: ranks by count desc with value tiebreak, keeps k") {
    val df = Seq("g" -> "a", "g" -> "a", "g" -> "b", "g" -> "b",
      "g" -> "c", "h" -> "z").toDF("k", "v")
    val out = Stats.topKByCount(df, Seq("k"), "v", k = 2)
      .select($"k", $"v", $"cnt", $"rk").as[(String, String, Long, Int)]
      .collect().toSet
    // a and b tie at 2 — 'a' wins rank 1 lexicographically; c is cut.
    assert(out == Set(("g", "a", 2L, 1), ("g", "b", 2L, 2), ("h", "z", 1L, 1)))
  }

  test("momentsInt: hand-computed numerators") {
    // Group g: x = 1,2,3; y = 2,4,6 (perfectly correlated).
    // n=3, sum_x=6, sum_xx=14, sum_y=12, sum_xy=28, sum_yy=56.
    // var_num_x = 3*14-36 = 6; var_num_y = 3*56-144 = 24;
    // cov_num = 3*28-72 = 12; corr = 12/sqrt(6*24) = 1.
    val df = Seq(("g", 1, 2), ("g", 2, 4), ("g", 3, 6)).toDF("k", "x", "y")
    val r = Stats.momentsInt(df, Seq("k"), "x", "y")
      .select($"n", $"var_num_x", $"var_num_y", $"cov_num")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((3L, 6L, 24L, 12L)))
  }

  test("momentsInt: bit-identical under repartitioning (long arithmetic)") {
    val df = (1 to 500).map(i => ("g" + (i % 3), i % 97, (i * 7) % 89))
      .toDF("k", "x", "y")
    val a = Stats.momentsInt(df, Seq("k"), "x", "y")
      .orderBy("k").collect().toSeq
    val b = Stats.momentsInt(df.repartition(13), Seq("k"), "x", "y")
      .orderBy("k").collect().toSeq
    assert(a == b)
  }
}
