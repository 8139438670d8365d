package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: plan point-in-interval range joins as bucketized
  * equijoins.
  *
  * Spark plans a join whose only condition is `p >= s AND p <= e` as a
  * broadcast nested loop — quadratic work and a forced-small side, the
  * scale cliff [[graft.operators.RangeJoin]] exists to avoid. This rule
  * lets users write the NATURAL theta join (SQL `BETWEEN`, Column `>=`/
  * `<=`) and still get the scalable plan: the interval side is exploded
  * into the fixed-width buckets it covers, the point side maps to its one
  * bucket, and the join gains a bucket equality — so Spark picks a hash /
  * sort-merge join and the original range predicate evaluates as a
  * residual. Each qualifying pair meets exactly once (in the point's
  * bucket), so no dedup is needed and results are bit-identical to the
  * nested loop.
  *
  * Scope guards (correctness first, rewrite only the cliff):
  *  - inner joins whose condition has a lower AND upper bound on the same
  *    LongType point expression (epoch millis — the engine's interval
  *    convention), point from one side, both bounds from the other;
  *  - only when the condition has NO equi-conjunct already (with one,
  *    Spark hash-joins on it and the range is a residual — rewriting
  *    would just add exchanges); this also makes the rule idempotent,
  *    since the rewritten join carries a bucket equality.
  *
  * Bucket width comes from `spark.graft.rangeJoin.bucket` (milliseconds;
  * 0 = rule off). Width trades interval replication against candidate
  * precision, exactly as in [[graft.operators.RangeJoin.pointInInterval]].
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** (point, bound) for a lower-bound conjunct `point >= bound`. */
  private def lowerBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(p, s) => Some((p, s))
      case LessThanOrEqual(s, p) => Some((p, s))
      case _ => None
    }

  /** (point, bound) for an upper-bound conjunct `point <= bound`. */
  private def upperBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(p, eb) => Some((p, eb))
      case GreaterThanOrEqual(eb, p) => Some((p, eb))
      case _ => None
    }

  private def from(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic && e.dataType == LongType

  def apply(plan: LogicalPlan): LogicalPlan = {
    // Validate here rather than bare-.toLong: a malformed value would
    // otherwise throw an uncontextualized NumberFormatException from the
    // optimizer on EVERY subsequent query in the session.
    val bucket = spark.conf.getOption("spark.graft.rangeJoin.bucket") match {
      case None => 0L
      case Some(v) =>
        try v.trim.toLong
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"spark.graft.rangeJoin.bucket must be a long (bucket width; " +
                s"<=0 disables the rewrite), got '$v'")
        }
    }
    if (bucket <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if rewritable(j, cond) =>
        val cs = conjuncts(cond)
        // Candidate (point, start, end) with point/bounds on opposite
        // sides — try (left=point, right=interval) then the flip.
        val attempt = findRange(cs, left, right).map { case (p, s, e) =>
          rewrite(j, left, right, p, s, e, bucket, flipped = false, hint)
        }.orElse(findRange(cs, right, left).map { case (p, s, e) =>
          rewrite(j, right, left, p, s, e, bucket, flipped = true, hint)
        })
        attempt.getOrElse(j)
    }
  }

  private def rewritable(j: Join, cond: Expression): Boolean = {
    val cs = conjuncts(cond)
    // No equi-conjunct across the two sides: with one, Spark already
    // hash-joins (and this guard keeps the rule idempotent — the
    // rewritten join carries the bucket equality).
    val hasEqui = cs.exists {
      case EqualTo(a, b) =>
        (from(a, j.left) && from(b, j.right)) ||
          (from(a, j.right) && from(b, j.left))
      case EqualNullSafe(a, b) =>
        (from(a, j.left) && from(b, j.right)) ||
          (from(a, j.right) && from(b, j.left))
      case _ => false
    }
    !hasEqui
  }

  /** Find `point` (from `pSide`) bounded below and above by expressions
    * from `iSide`.
    */
  private def findRange(
      cs: Seq[Expression], pSide: LogicalPlan, iSide: LogicalPlan)
      : Option[(Expression, Expression, Expression)] = {
    val lowers = cs.flatMap(lowerBound).filter { case (p, s) =>
      from(p, pSide) && from(s, iSide) }
    val uppers = cs.flatMap(upperBound).filter { case (p, e) =>
      from(p, pSide) && from(e, iSide) }
    (for {
      (p1, s) <- lowers
      (p2, e) <- uppers
      if p1.semanticEquals(p2)
    } yield (p1, s, e)).headOption
  }

  /** Build: point side + its bucket; interval side exploded into covered
    * buckets; inner join on (bucket equality AND the original condition);
    * project back to the original output (in the original order — `j` may
    * have been matched with sides flipped).
    */
  private def rewrite(
      j: Join, pSide: LogicalPlan, iSide: LogicalPlan,
      p: Expression, s: Expression, e: Expression, bucket: Long,
      flipped: Boolean, hint: JoinHint): LogicalPlan = {
    val b = Literal(bucket, LongType)
    val pb = Alias(IntegralDivide(p, b), "__graft_pb")()
    val pointPlan = Project(pSide.output :+ pb, pSide)
    val ib = AttributeReference("__graft_ib", LongType)()
    // Sequence is TimeZoneAwareExpression: the analyzer's ResolveTimeZone
    // has already run by optimization time, so set the zone explicitly or
    // the new subtree reads as unresolved and plan validation fails.
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    val intervalPlan = Generate(
      Explode(Sequence(IntegralDivide(s, b), IntegralDivide(e, b), None, tz)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(ib), child = iSide)
    val cond = And(j.condition.get, EqualTo(pb.toAttribute, ib))
    // Keep the original left/right orientation for the new join's sides
    // (column order is restored by the final Project either way).
    val newJoin =
      if (flipped) Join(intervalPlan, pointPlan, Inner, Some(cond), hint)
      else Join(pointPlan, intervalPlan, Inner, Some(cond), hint)
    Project(j.output, newJoin)
  }
}
