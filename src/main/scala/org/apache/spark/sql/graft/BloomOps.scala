package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.util.sketch.BloomFilter

/** Column-API surface over Spark's internal Bloom-filter expressions (the
  * machinery behind AQE's runtime row-group filters, not otherwise exposed
  * to users): build a Bloom sketch of a key set with one aggregation, probe
  * it with a codegen'd predicate.
  *
  * This is the 100 TB shape of membership tests whose reference set is too
  * big to broadcast *exactly* but whose sketch fits anywhere: benchmark
  * decontamination, delta-vs-corpus dedup, URL blocklists. The probe has no
  * false negatives — a "miss" is definitive — so exact verification is only
  * ever needed on the (rare) hits.
  *
  * Values are hashed to longs with xxhash64 before insert/probe, matching
  * what Spark's own runtime-filter injection feeds these expressions.
  */
object BloomOps {

  /** Aggregate a column into a serialized Bloom filter (binary), sized by
    * `optimalNumOfBits(expectedItems, fpp)`. Mergeable partial aggregation:
    * each task builds a local sketch, the final merge ORs the bit sets —
    * one reduction, no shuffle of the underlying values.
    */
  def bloomAgg(values: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp in (0, 1)")
    // Cap at 2^30 bits (128 MB, the Sessions.withDefaults maxNumBits
    // ceiling): past it the sketch keeps working with a gracefully
    // degrading fpp — callers treat hits as candidates to verify anyway.
    val numBits = math.min(
      BloomFilter.optimalNumOfBits(expectedItems, fpp), 1L << 30)
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(xxhash64(values)),
      Literal(expectedItems),
      Literal(numBits)).toAggregateExpression())
  }

  /** Probe: true iff `value` *might* be in the sketch (false positives at
    * ~fpp; never false negatives). `bloom` must be a constant/foldable
    * binary (a collected sketch via `lit(bytes)`) or a scalar subquery —
    * the same contract Spark's runtime filters obey, which is what lets
    * the predicate stay a pure codegen'd projection on the probe side.
    */
  def mightContain(bloom: Column, value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom),
      ExpressionUtils.expression(xxhash64(value))))
}
