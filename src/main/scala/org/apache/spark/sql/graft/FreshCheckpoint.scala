package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow

/** Eager local checkpoint that does NOT inherit the origin plan's
  * Catalyst statistics.
  *
  * `Dataset.localCheckpoint` wraps the checkpointed RDD in a `LogicalRDD`
  * that carries the ORIGIN plan's `Statistics` forward. In an iterative
  * operator that self-joins its own checkpoint each round (label
  * propagation's pointer jump, dangling-mass PageRank), the size-only
  * stats estimator MULTIPLIES the two sides' `sizeInBytes`, so the stat
  * SQUARES every round: after k rounds it is a 2^k-bit BigInteger, and
  * every stats consultation during planning runs Toom-Cook
  * multiplications on megabit numbers. Probe-measured on the sf1 DBSCAN
  * gate: the per-round checkpoint job grew 0.5 s → 78 s by round 21
  * (the join itself stayed ~0.5 s) purely from driver-side
  * BigInteger.multiply, with stats bit-length 95 → 2,331,205 over 14
  * rounds.
  *
  * This helper replicates what `Dataset.localCheckpoint` does to the
  * DATA — materialize the physical plan's row RDD (defensively copied:
  * unsafe rows are reused buffers), `localCheckpoint()` it, force it
  * with a count — but rebuilds the Dataset with
  * `internalCreateDataFrame`, whose `LogicalRDD` carries DEFAULT
  * statistics: constant-size stats every round, O(1) planning forever.
  * Accessible because this package sits under `org.apache.spark.sql`
  * (the same placement the native expressions use).
  */
object FreshCheckpoint {

  /** A checkpointed round table: the rebuilt DataFrame, the EXACT RDD
    * handle whose blocks back it, and the row count the forcing count
    * already produced (free to the caller — peel loops branch on it).
    * Release with `rdd.unpersist(blocking = false)` once the round that
    * used it has materialized its successor.
    */
  final case class Pinned(df: DataFrame, rdd: RDD[InternalRow], rows: Long)

  def apply(df: DataFrame): DataFrame = pinned(df).df

  /** Like `apply`, but also returns the checkpointed RDD handle so the
    * caller can later release EXACTLY the block it created. Iterative
    * operators used to identify their checkpoint block by diffing the
    * global `sc.getPersistentRDDs` keyset around this call — which
    * captures any RDD persisted concurrently on the same context and,
    * because these are localCheckpoint blocks, unpersisting someone
    * else's still-in-use block is an unrecoverable missing-block
    * failure, not a recompute.
    */
  def pinned(df: DataFrame): Pinned = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val n = rdd.count()
    Pinned(spark.internalCreateDataFrame(rdd, df.schema), rdd, n)
  }

  /** Lazy variant: no forcing count — the blocks materialize with the
    * CALLER's first action over the returned df (`rows` is therefore -1).
    * Right for loops that run their own per-round aggregate anyway (the
    * convergence test doubles as the forcing action), where the eager
    * count is a whole extra job of pure fixed cost per round. Same
    * default-stats / truncated-lineage properties as `pinned`.
    */
  def lazyPinned(df: DataFrame): Pinned = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    Pinned(spark.internalCreateDataFrame(rdd, df.schema), rdd, -1L)
  }
}
