package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

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
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    spark.internalCreateDataFrame(rdd, df.schema)
  }
}
