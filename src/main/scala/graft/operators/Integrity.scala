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

  /** COLUMN-level reconciliation of two keyed snapshots — the drill-down
    * companion to [[fingerprint]] (which says *whether* two sides agree)
    * and to `Snapshot.diff` (which emits the changed *rows*): after a
    * migration or an engine swap, the question is usually "WHICH FIELDS
    * drifted, and how much" — one report row per compared column with
    * how many keys matched on it, not a delta the size of the change.
    *
    * One full outer join on the key (null-safe, with presence markers so
    * legitimately-null key columns cannot masquerade as inserts — same
    * discipline as `Snapshot.diff`), then a single aggregate computing
    * per-column null-safe mismatch counts plus the shared presence
    * totals, unpivoted plan-side into the per-column report. Scale
    * posture: one shuffle (the join), one map-side-partial aggregate to
    * a |columns|-sized result — report size is schema-sized, never
    * data-sized.
    *
    * Output per compared column, plus the presence facts carried on
    * every row so each line reads standalone:
    * (col_name, n_both, n_only_before, n_only_after, n_mismatch).
    */
  def reconcileColumns(before: DataFrame, after: DataFrame,
                       keys: Seq[String]): DataFrame = {
    val cols = before.columns.toSeq
    val dataCols = cols.filterNot(keys.contains)
    require(dataCols.nonEmpty, "reconcile needs non-key columns")
    val b = before.select(cols.map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__b_present", lit(true))
    val a = after.select(cols.map(c => col(c).as(s"__a_$c")): _*)
      .withColumn("__a_present", lit(true))
    val on = keys.map(k => col(s"__b_$k") <=> col(s"__a_$k")).reduce(_ && _)
    val inB = col("__b_present").isNotNull
    val inA = col("__a_present").isNotNull
    // coalesce: sum() over the zero-row join (two empty snapshots) is
    // null, and a null count would fail a downstream `n_mismatch == 0`
    // PASS check — the empty reconciliation is a clean zero report.
    val one = (c: org.apache.spark.sql.Column) =>
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val aggCols = Seq(one(inB && inA).as("__both"),
      one(inB && !inA).as("__only_b"),
      one(!inB && inA).as("__only_a")) ++
      dataCols.map(c => one(inB && inA &&
        !(col(s"__b_$c") <=> col(s"__a_$c"))).as(s"__mm_$c"))
    val agg = b.join(a, on, "full_outer").agg(aggCols.head, aggCols.tail: _*)
    val report = array(dataCols.map(c =>
      struct(lit(c).as("col_name"), col(s"__mm_$c").as("n_mismatch"))): _*)
    agg.select(explode(report).as("__r"),
        col("__both"), col("__only_b"), col("__only_a"))
      .select(col("__r.col_name").as("col_name"),
        col("__both").as("n_both"),
        col("__only_b").as("n_only_before"),
        col("__only_a").as("n_only_after"),
        col("__r.n_mismatch").as("n_mismatch"))
  }

  /** Referential-integrity audit of ONE child→parent relationship: how
    * many child rows point at a parent key that does not exist (the
    * partial-load / out-of-order-ingest detector every warehouse
    * load-validation step runs), plus how many carry a null key (not
    * an orphan — a different defect, reported separately). One row out.
    *
    * Scale posture: parent keys are projected and deduped before the
    * join (the probe side carries keys only, never parent payload);
    * one left join + one single-row aggregate with map-side partials.
    * Compose over relationships by unioning the one-row reports.
    */
  def fkOrphans(child: DataFrame, childKey: String, parent: DataFrame,
                parentKey: String, rel: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
      .withColumn("__hit", lit(true))
    child.select(col(childKey).as("__ck"))
      .join(p, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_child"),
        coalesce(sum(when(col("__ck").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_null_key"),
        coalesce(sum(when(col("__ck").isNotNull && col("__hit").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_orphan"))
      .select(lit(rel).as("rel"), col("n_child"), col("n_null_key"),
        col("n_orphan"))
  }
}
