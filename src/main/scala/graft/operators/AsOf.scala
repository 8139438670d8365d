package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of (a.k.a. point-in-time) join: for each left row, attach the most
  * recent right row with `right.ts <= left.ts` within the same key group —
  * the standard market-data / feature-store lookup that Spark's built-in
  * joins don't express directly.
  *
  * Formulation: tag both sides, union by name, and carry the latest right
  * row forward with `last(_, ignoreNulls = true)` over a per-key window
  * ordered by (ts, side) — right rows sort before left rows at equal
  * timestamps, which yields the inclusive `<=` as-of semantic. This is ONE
  * shuffle on the key (the window partition), no range-join row explosion,
  * no per-row probe — at 100 TB it scales exactly like any windowed
  * aggregation. (A broadcast range join would force the right side small;
  * a theta join `l.ts >= r.ts` would plan a nested loop and explode.)
  *
  * The right row travels as a single struct so all attached columns come
  * from the SAME matched row (independent per-column `last()` calls could
  * mix rows when right columns contain nulls).
  *
  * Determinism: if several right rows can share (keys, ts), pass
  * `rightOrder` — the last row under that order wins (backward mode; the
  * first wins in forward mode, the natural mirror).
  *
  * `forward = true` flips the direction: attach the EARLIEST right row with
  * `right.ts >= left.ts` (the next-event lookup) — same plan, the window
  * scan just runs over descending timestamps.
  */
object AsOf {

  def joinAsOf(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      rightOrder: Seq[String] = Nil, forward: Boolean = false): DataFrame = {
    val l = left
      .withColumn("__ats", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ats"),
          struct(rightCols.map(col): _*).as("__rv")) ++
        rightOrder.map(c => col(c).as(s"__ro_$c")): _*)
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at equal timestamps in BOTH
    // directions (inclusive <= / >=); __ro is null on left rows, so
    // nulls_last only breaks ties among right rows.
    val order: Seq[Column] =
      if (forward)
        col("__ats").desc +: col("__side") +:
          rightOrder.map(c => col(s"__ro_$c").desc_nulls_last)
      else
        col("__ats") +: col("__side") +:
          rightOrder.map(c => col(s"__ro_$c").asc_nulls_last)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    u.withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** As-of join with a STALENESS BOUND: the nearest right row still
    * matches only if it is within `toleranceMs` of the left timestamp —
    * otherwise the transported columns are null (pandas' merge_asof
    * `tolerance`). A quote older than the bound is not a usable quote;
    * this is the semantic real feature-lookup pipelines want, and it is a
    * pure post-projection on [[joinAsOf]]'s one-shuffle plan — same
    * exchange count, the bound never re-joins.
    */
  def joinAsOfTolerance(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      toleranceMs: Long, rightOrder: Seq[String] = Nil,
      forward: Boolean = false): DataFrame = {
    require(toleranceMs >= 0, "toleranceMs must be >= 0")
    val mts = "__match_ts"
    val joined = joinAsOf(left, right.withColumn(mts, col(rightTs)),
      keys, leftTs, rightTs, rightCols :+ mts, rightOrder, forward)
    val gap =
      if (forward) unix_millis(col(mts)) - unix_millis(col(leftTs))
      else unix_millis(col(leftTs)) - unix_millis(col(mts))
    val keep = col(mts).isNotNull && gap <= toleranceMs
    joined.select(left.columns.toIndexedSeq.map(col) ++
      rightCols.map(c => when(keep, col(c)).otherwise(lit(null)).as(c)): _*)
  }

  /** NEAREST-in-time as-of join: attach the right row whose timestamp is
    * closest to the left's in EITHER direction, ties to the past —
    * pandas' merge_asof(direction='nearest'), the sensor-alignment /
    * label-attachment semantic the single-direction forms can't give.
    *
    * One union, ONE shuffle (both windows share the per-key partition;
    * Catalyst plans one exchange + two sorts): the backward candidate is
    * [[joinAsOf]]'s cumulative `last`, the forward candidate a mirrored
    * `first` over [current, following) whose ordering puts right rows
    * AFTER left rows at equal timestamps (so both directions stay
    * inclusive). The winner is chosen per row by exact integer gap
    * comparison, and the whole matched row travels as one struct — the
    * two candidates never mix columns.
    *
    * Timestamps must be NUMERIC (epoch millis) — integer gaps are what
    * make the tie rule exact; callers with timestamp columns pass
    * `unix_millis` projections. Tie semantics within equal right
    * timestamps follow the directional forms: last-in-`rightOrder` wins
    * backward, first wins forward.
    *
    * Output: left columns + rightCols of the winner + `asof_dir`
    * ('b'/'f', null when the key group has no right rows).
    */
  def joinAsOfNearest(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      rightOrder: Seq[String] = Nil): DataFrame = {
    val l = left
      .withColumn("__ats", col(leftTs).cast("long"))
      .withColumn("__side", lit(1))
    val r = right
      // A null right timestamp is not "infinitely old" — it would sort
      // first and win every backward window; it is no match at all.
      .filter(col(rightTs).isNotNull)
      .select(
        keys.map(col) ++
          Seq(col(rightTs).cast("long").as("__ats"),
            struct(col(rightTs).cast("long").as("__rts") +:
              rightCols.map(col): _*).as("__rv")) ++
          rightOrder.map(c => col(c).as(s"__ro_$c")): _*)
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val W = org.apache.spark.sql.expressions.Window
    val wB = W.partitionBy(keys.map(col): _*)
      .orderBy((col("__ats") +: col("__side") +:
        rightOrder.map(c => col(s"__ro_$c").asc_nulls_last)): _*)
      .rowsBetween(W.unboundedPreceding, 0)
    val wF = W.partitionBy(keys.map(col): _*)
      .orderBy((col("__ats") +: col("__side").desc +:
        rightOrder.map(c => col(s"__ro_$c").asc_nulls_last)): _*)
      .rowsBetween(0, W.unboundedFollowing)
    val b = col("__b")
    val f = col("__f")
    val gapB = col("__ats") - b.getField("__rts")
    val gapF = f.getField("__rts") - col("__ats")
    val pickB = f.isNull || (b.isNotNull && gapB <= gapF)
    val chosen = when(b.isNull, f).when(pickB, b).otherwise(f)
    val dir = when(b.isNull && f.isNull, lit(null))
      .when(b.isNull, "f").when(pickB, "b").otherwise("f")
    u.withColumn("__b", last(col("__rv"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__rv"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
      .withColumn("__c", chosen)
      .withColumn("asof_dir", dir)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => col(s"__c.$c").as(c)) :+ col("asof_dir"): _*)
  }
}
