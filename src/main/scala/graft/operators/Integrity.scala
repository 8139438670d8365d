package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent dataset fingerprints — the 100 TB copy-integrity
  * primitive: after a migration, replication or engine swap, two sides
  * compare one (or a handful of) rows instead of 100 TB of bytes.
  *
  * Per row: md5 over a canonical '|'-joined rendering of the named
  * columns (nulls as a sentinel so (a,null) and (null,a) differ); the
  * digest's two disjoint 15-hex-digit slices parse to 60-bit integers
  * whose SUMS are the checksum. Addition commutes, so the fingerprint is
  * independent of partitioning, row order, cluster size and engine — and
  * 2×60 summed bits make an undetected mismatch vanishingly unlikely.
  * Sums accumulate in DECIMAL(38,0): 2^60 per row keeps exact headroom
  * past 10^18 rows, far beyond the target scale.
  *
  * Scale posture: a full scan + one all-columns-projected md5 per row
  * (codegen) + a single partial-aggregated sum — the cheapest possible
  * whole-dataset pass, no shuffle beyond the one-row (or per-group)
  * final aggregate.
  *
  * Caveat: rows render via CAST(col AS STRING), exact for integral /
  * string / date types. Floating-point columns must be canonicalized by
  * the caller first (fixed-point grid or hex bits) — engines disagree on
  * double-to-string rendering.
  */
object Integrity {

  // U+0001 sentinel: never produced by CAST-to-string of real values,
  // so a null and any non-null rendering cannot collide.
  private val NullTok = "\u0001"

  private def rowDigest(cols: Seq[String]) =
    md5(concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit(NullTok))): _*))

  private def slice(d: org.apache.spark.sql.Column, from: Int) =
    conv(substring(d, from, 15), 16, 10).cast(DecimalType(38, 0))

  /** One-row (n, ck_lo, ck_hi) fingerprint over the named columns. */
  def fingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val d = rowDigest(cols)
    df.select(d.as("__d"))
      .agg(count(lit(1)).as("n"),
        sum(slice(col("__d"), 1)).as("ck_lo"),
        sum(slice(col("__d"), 17)).as("ck_hi"))
  }

  /** Streaming fingerprint maintenance: each micro-batch's partial
    * (n, ck_lo, ck_hi) is ADDED onto a versioned one-row snapshot —
    * commutativity is exactly what makes the checksum incrementally
    * maintainable, so a landing stream carries a continuously-current
    * integrity handshake without ever re-reading history. Batch `i`
    * reads the latest snapshot strictly below `i` and overwrites its own
    * version, so replayed batches are idempotent (the
    * [[graft.streaming.Streams.aggSink]] discipline).
    */
  def fingerprintSink(df: DataFrame, cols: Seq[String], dir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
       id: Long) =>
        val s = batch.sparkSession
        val delta = fingerprint(batch.toDF(), cols)
        val merged = graft.streaming.Streams
          .latestSnapshotBefore(s, dir, id)
          .map { p =>
            s.read.parquet(p).unionByName(delta)
              .agg(sum(col("n")).as("n"),
                sum(col("ck_lo")).as("ck_lo"),
                sum(col("ck_hi")).as("ck_hi"))
          }
          .getOrElse(delta)
        merged.select(col("n").cast("long").as("n"),
            col("ck_lo").cast(DecimalType(38, 0)).as("ck_lo"),
            col("ck_hi").cast(DecimalType(38, 0)).as("ck_hi"))
          .write.mode("overwrite").parquet(s"$dir/v$id")
        ()
    }

  /** Per-group fingerprints — bisect WHERE two copies diverge (per
    * partition key, per day, per shard) without re-reading the matching
    * groups.
    */
  def fingerprintBy(df: DataFrame, groupCols: Seq[String],
                    cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    require(groupCols.nonEmpty, "fingerprintBy needs grouping columns")
    val d = rowDigest(cols)
    df.select(groupCols.map(col) :+ d.as("__d"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(slice(col("__d"), 1)).as("ck_lo"),
        sum(slice(col("__d"), 17)).as("ck_hi"))
  }
}
