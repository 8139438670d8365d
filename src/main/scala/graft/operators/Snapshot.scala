package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-maintenance operators: MERGE-style upsert, slowly-changing
  * dimension (type 2) history build, and CDC snapshot diff. These are the
  * warehouse-side mutations a pipeline like the reference's truncate-load
  * (SURVEY.md §2.1 S9) grows into once full reloads stop being affordable —
  * at 100 TB you merge deltas, you don't rewrite the table.
  *
  * Scale posture: each operator is a single hash-shuffle on the key columns
  * (union+window or one join), no driver-side state, no cross join. All
  * three are deterministic given the documented input contracts, which the
  * oracle gates rely on.
  */
object Snapshot {

  /** MERGE upsert: rows of `updates` replace same-keyed rows of `base`;
    * unmatched update rows are inserts. Both inputs must be snapshots —
    * at most one row per key — which makes the keep-highest-priority
    * window deterministic (at most two candidates per key, distinct
    * priorities). One shuffle on `keys`; schemas must match.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    val tagged = base.select(cols.map(col): _*).withColumn("__src", lit(0))
      .unionByName(updates.select(cols.map(col): _*).withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** MERGE with SCHEMA EVOLUTION (the lakehouse mergeSchema-on-write
    * contract): like [[upsert]], but the update batch may carry columns
    * the base lacks (and vice versa) — the output schema is the
    * by-name union, base rows read null for newly-arrived columns,
    * update rows null for columns they dropped. This is the write-path
    * complement of the s4 mergeSchema READ gate: producers add fields
    * without a coordinated base rewrite.
    *
    * Same plan as upsert: one union + one keyed window shuffle;
    * keep-priority (updates win) unchanged.
    */
  def upsertEvolve(base: DataFrame, updates: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)),
        allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** Type-2 SCD history from an event log: one row per run of equal
    * `attrCol` values per key, ordered by (`tsCol`, `ordCol`) — `ordCol`
    * must break ties totally or versioning is nondeterministic. Emits
    * (key, attr, valid_from, valid_to, version, is_current) where
    * `valid_to` is the next version's start (null while current).
    * Two window passes over the same (key, ts, ord) sort — Catalyst
    * plans them in one shuffle + one sort.
    */
  def scd2(events: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, ordCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    val changes = events
      .withColumn("__prev", lag(col(attrCol), 1).over(byTime))
      // first event of a key or a value change opens a new version
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .select(col(keyCol), col(attrCol), col(tsCol).as("valid_from"),
        col(ordCol).as("__ord"))
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from"), col("__ord"))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .withColumn("version", row_number().over(byStart))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__ord")
  }

  /** CDC diff of two keyed snapshots: emits only changed keys, with
    * `op` = 'I' (key only in `after`), 'D' (only in `before`) or 'U'
    * (present in both, any non-key column differing). Carries the after
    * image for I/U and the before image for D. Unchanged keys are dropped,
    * so the output is delta-sized, not snapshot-sized. One shuffle (full
    * outer join on `keys`); null-safe comparison column by column.
    */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = before.columns.toSeq
    val dataCols = cols.filterNot(keys.contains)
    // Presence markers, not key nullability: a legitimately-null key
    // column would otherwise misclassify matched rows as inserts.
    val b = before.select(cols.map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__b_present", lit(true))
    val a = after.select(cols.map(c => col(c).as(s"__a_$c")): _*)
      .withColumn("__a_present", lit(true))
    val on = keys.map(k => col(s"__b_$k") <=> col(s"__a_$k")).reduce(_ && _)
    val inBefore = col("__b_present").isNotNull
    val inAfter = col("__a_present").isNotNull
    val changed = dataCols
      .map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val op = when(!inBefore, "I").when(!inAfter, "D")
      .when(changed, "U")
    val image = cols.map { c =>
      when(col("op") === "D", col(s"__b_$c"))
        .otherwise(col(s"__a_$c")).as(c)
    }
    b.join(a, on, "full_outer")
      .withColumn("op", op)
      .filter(col("op").isNotNull)
      .select(col("op") +: image: _*)
  }

  /** Mergeable partial aggregate of `raw`: per-key row count plus exact
    * decimal sums of each `sumCols` entry (output column → source
    * expression). This is Spark's own partial-aggregation contract
    * (commutative, associative, exact) lifted across batch boundaries so
    * a materialized aggregate can be maintained incrementally.
    */
  def aggPartials(raw: DataFrame, keys: Seq[String],
                  sumCols: Seq[(String, String)]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +: sumCols.map { case (out, src) =>
      sum(expr(src).cast("decimal(18,6)")).as(out)
    }
    raw.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Refresh a materialized aggregate from a delta WITHOUT re-scanning the
    * base fact table: union the stored partials with the delta's partials
    * and re-combine. Counts add; exact decimal sums add without drift, so
    * refresh(base ⊎ delta) ≡ full recompute, bit for bit — the property
    * that makes incremental maintenance safe to run forever.
    *
    * Scale posture: cost ∝ |aggregate table| + |delta|, independent of the
    * base fact table's size — the entire point at 100 TB, where the fact
    * scan is the unaffordable part. One hash shuffle on `keys`; with both
    * sides bucketed on `keys` (io.Writers) even that exchange drops out.
    */
  /** Delta of an equi-join view under insert-only base deltas — the join
    * half of incremental view maintenance (aggregates: [[aggPartials]] /
    * [[mergePartials]]). Standard delta algebra:
    *
    *   Δ(A ⋈ B) = (ΔA ⋈ B₀) ∪ (A₀ ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * so the maintained view is `view₀ ⊎ incrJoinDelta(...)` and the stored
    * A₀ ⋈ B₀ join never re-runs. Exact multiset semantics (unionByName of
    * the three disjoint terms), so refresh ≡ full recompute bit for bit.
    *
    * Scale posture: cost ∝ |deltas| × match rate, independent of
    * |A₀ ⋈ B₀| — the point at 100 TB, where re-joining the base tables is
    * the unaffordable part. Small deltas broadcast (AQE); with the base
    * snapshots bucketed on the join key (io.Writers) the base-side
    * exchanges drop out too, leaving delta-sized work only.
    */
  def incrJoinDelta(baseA: DataFrame, deltaA: DataFrame,
                    baseB: DataFrame, deltaB: DataFrame,
                    on: Seq[String]): DataFrame =
    deltaA.join(baseB, on)
      .unionByName(baseA.join(deltaB, on))
      .unionByName(deltaA.join(deltaB, on))

  def mergePartials(baseAgg: DataFrame, deltaAgg: DataFrame,
                    keys: Seq[String]): DataFrame = {
    val valueCols = baseAgg.columns.filterNot(keys.contains).toSeq
    val merged = baseAgg.unionByName(deltaAgg)
    // sum(cnt) keeps longs long; decimal sums widen but stay exact.
    val aggs = valueCols.map {
      case "cnt" => sum(col("cnt")).as("cnt")
      case c => sum(col(c)).as(c)
    }
    merged.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
