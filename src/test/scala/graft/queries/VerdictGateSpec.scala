package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Teeth for the sketch-verdict booleans (r13). The x5_approx_* /
  * x6_decontam_bloom oracles can only ever assert the verdict columns are
  * TRUE — a comparison bug that made a verdict vacuously true would stay
  * driver-green at every scale forever. This spec evaluates the SAME
  * Column builders the gates use (single source in [[Extensions]]) on
  * crafted inputs where the correct answer is known for BOTH polarities.
  */
class VerdictGateSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def evalBool(rows: Seq[(Double, Double, Double, Double)],
                       f: (org.apache.spark.sql.Column,
                           org.apache.spark.sql.Column,
                           org.apache.spark.sql.Column,
                           org.apache.spark.sql.Column)
                         => org.apache.spark.sql.Column): Seq[Boolean] = {
    import spark.implicits._
    rows.toDF("a", "b", "c", "d")
      .select(f(col("a"), col("b"), col("c"), col("d")).as("v"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  test("hllWithinEps goes false beyond the envelope, true inside") {
    import spark.implicits._
    val out = Seq(
      (104.0, 100.0), // +4% of exact: inside the 5% envelope
      (95.1, 100.0),  // -4.9%: inside
      (106.0, 100.0), // +6%: OUTSIDE
      (94.0, 100.0),  // -6%: OUTSIDE
      (105.0, 100.0)  // boundary: |diff| == eps*exact counts as inside
    ).toDF("approx", "exact")
      .select(Extensions.hllWithinEps(col("approx"), col("exact"), 0.05)
        .as("v"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(out == Seq(true, true, false, false, true))
  }

  test("rankWithinErr: interval intersection with teeth on both sides") {
    // (lt, le, target, err): the sketch value's ranks span [lt+1, le].
    val cases = Seq(
      (4999.0, 5001.0, 5000.0, 2.0),  // tight straddle: true
      (0.0, 10000.0, 5000.0, 2.0),    // massive tie covering target: true
      (5100.0, 5200.0, 5000.0, 2.0),  // whole interval above band: FALSE
      (4000.0, 4500.0, 5000.0, 2.0),  // whole interval below band: FALSE
      (5001.0, 5300.0, 5000.0, 2.0),  // lt+1 = target+err boundary: true
      (0.0, 4998.0, 5000.0, 2.0)      // le = target-err boundary: true
    )
    val out = evalBool(cases, Extensions.rankWithinErr)
    assert(out == Seq(true, true, false, false, true, true))
  }

  test("subsetOk: false exactly when extra pairs exist") {
    import spark.implicits._
    val out = Seq(0L, 1L, 5L).toDF("extra")
      .select(Extensions.subsetOk(col("extra")).as("v"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(out == Seq(true, false, false))
  }

  test("recallAtLeast: both polarities including the boundary and empty truth") {
    import spark.implicits._
    val out = Seq(
      (90L, 100L),  // exactly at the 0.9 bound: true
      (89L, 100L),  // one below: FALSE
      (100L, 100L), // full recall: true
      (0L, 100L),   // surfaced nothing: FALSE
      (0L, 0L)      // empty truth: vacuously true
    ).toDF("hit", "truth")
      .select(Extensions.recallAtLeast(col("hit"), col("truth"), 0.9).as("v"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(out == Seq(true, false, true, false, true))
  }

  test("gate-shaped sanity: exact-percentile input yields all-true verdicts") {
    // With n << accuracy the sketch is exact, so every verdict must hold —
    // the same reason the gates are deterministic-green at small sf.
    import spark.implicits._
    val li = (1 to 200).map(i => ("A", (i % 50).toDouble, i.toDouble))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val appr = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
          .as("v50"))
    val n = col("n").cast("double")
    val err = n / lit(10000.0) + lit(1.0)
    val verdicts = li.join(broadcast(appr), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_quantity") < col("v50"), 1L).otherwise(0L))
          .as("lt50"),
        sum(when(col("l_quantity") <= col("v50"), 1L).otherwise(0L))
          .as("le50"))
      .select(Extensions.rankWithinErr(col("lt50").cast("double"),
        col("le50").cast("double"), n * lit(0.5), err).as("ok"))
      .collect().map(_.getBoolean(0))
    assert(verdicts.forall(identity))
  }
}
