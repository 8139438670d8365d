package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match point rows to interval rows containing
  * them, per key. The naive formulation — a theta join on
  * `point BETWEEN start AND end` — has no equi-condition, so Spark plans a
  * broadcast nested loop: quadratic work and a forced-small side. The
  * scalable formulation discretizes time into fixed buckets: every interval
  * explodes into the buckets it covers, every point maps to exactly one
  * bucket, and the join becomes an EQUIJOIN on (keys, bucket) followed by
  * the exact containment filter. Each (point, interval) pair can only meet
  * in the point's bucket, so no dedup is needed.
  *
  * `bucketMs` trades replication against candidate precision: buckets about
  * as wide as a typical interval replicate each interval into ~2 rows while
  * keeping candidates tight. At 100 TB this is one shuffle on
  * (keys, bucket) — the same cost envelope as any equijoin, with AQE
  * handling hot buckets.
  */
object RangeJoin {

  /** Points (with an epoch-ms `tsCol`) joined to intervals (epoch-ms
    * `startCol`/`endCol`, inclusive ends) sharing `keys`. Output: point
    * columns + the interval's columns (both sides' key columns merged).
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val p = points.withColumn("__bucket", expr(s"$tsCol DIV $bucketMs"))
    val i = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startCol DIV $bucketMs"),
        expr(s"$endCol DIV $bucketMs"))))
    p.join(i, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval×interval OVERLAP join: pairs of intervals (inclusive ends)
    * that intersect. Same discretization idea as [[pointInInterval]], with
    * one extra subtlety: two long intervals can share MANY buckets, so a
    * plain bucket equijoin would emit duplicate pairs. Instead of a
    * `distinct` over the (potentially huge) join output, each candidate is
    * kept only in the bucket containing `greatest(start_l, start_r)` — the
    * first bucket the two intervals share — so every overlapping pair
    * survives exactly once and the dedup costs a codegen'd filter, not a
    * shuffle.
    *
    * Both inputs must carry epoch-integer `startCol`/`endCol`. Output:
    * all columns of both sides (keys merged). One shuffle on
    * (keys, bucket); replication factor = interval length / bucket width.
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val l = left.withColumn("__bucket",
      explode(sequence(expr(s"$lStart DIV $bucket"), expr(s"$lEnd DIV $bucket"))))
    val r = right.withColumn("__bucket",
      explode(sequence(expr(s"$rStart DIV $bucket"), expr(s"$rEnd DIV $bucket"))))
    l.join(r, keys :+ "__bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") ===
        expr(s"greatest($lStart, $rStart) DIV $bucket"))
      .drop("__bucket")
  }
}
