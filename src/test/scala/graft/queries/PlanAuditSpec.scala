package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-level scale-posture audit over representative gates: builds each
  * query's physical plan against the sf0.001 fixtures (planning only — the
  * audited list deliberately excludes gates that stage scratch data or run
  * streams at construction time) and asserts the properties that decide
  * whether a plan survives a 100× scale-up.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Pure-batch gates whose DataFrame construction performs no staging
    * writes, no stream runs, and no driver-side centroid collects.
    */
  private val audited = Seq(
    "q1_agg", "q3_topk_join", "q5_join_agg", "q7_nation_flow",
    "q9_profit", "q10_returns", "q13_cust_dist", "q18_large_orders",
    "q19_disjunctive", "q21_sole_returner", "q22_idle_rich",
    "w1_window", "w2_running_sum", "w4_rolling",
    "j1_semi_anti", "j2_outer", "j4_exists", "j6_null_safe_join",
    "g1_rollup", "g4_histogram", "g5_stats",
    "f1_funnel", "f2_retention", "f3_transitions", "f4_paths",
    "f5_cum_uniques", "ev1_time_agg", "ev2_sessionize", "ts1_gapfill",
    "x1_dedup", "x2_jaccard_pairs", "x2_simhash", "x5_token_stats",
    "x5_quality", "x7_split", "x9_skew", "x9_kanon", "x9_profile",
    "x9_ks", "x10_assoc", "x3_gram",
    "x8_linkpred", "ts8_autocorr", "x2_sorted_nbr", "x5_heaps",
    "x4_shard", "x9_residuals",
    "x9_mannwhitney", "x9_spearman", "x9_gini",
    // r14: the lshAudit-backed verdict gate (band self-join + two
    // independent intersection paths — every join an equijoin).
    "x2_minhash_fast")

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("no audited gate plans a cartesian product") {
    audited.foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"),
        s"$n plans a CartesianProduct — that plan dies at scale:\n$p")
    }
  }

  test("join-heavy flagships broadcast their dimension sides") {
    Seq("q3_topk_join", "q5_join_agg", "q7_nation_flow", "q9_profit")
      .foreach { n =>
        assert(plan(n).contains("BroadcastHashJoin"),
          s"$n should broadcast small dims")
      }
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort") {
    Seq("q3_topk_join", "q10_returns", "f4_paths").foreach { n =>
      assert(plan(n).contains("TakeOrderedAndProject"),
        s"$n should take-ordered its top-k")
    }
  }

  test("the filtered fact scan pushes its predicates into parquet") {
    val p = plan("q1_agg")
    val pushed = "PushedFilters: \\[[^\\]]*(LessThan|GreaterThan|EqualTo|IsNotNull)".r
    assert(pushed.findFirstIn(p).isDefined,
      s"q1_agg's scan should push filters:\n$p")
  }

  test("windowed top-k per group uses the partial WindowGroupLimit") {
    assert(plan("x5_heavy_hitters").contains("WindowGroupLimit"),
      "per-group top-k should prune map-side")
  }

  test("single-shuffle analytics shuffle exactly once before the gate ORDER BY") {
    // ts8_autocorr: window + same-key aggregate share one exchange;
    // x4_shard: one keyed running-sum window + the shard aggregate share
    // the group key. Budget: 1 data exchange + spread + gate ORDER BY.
    Seq("ts8_autocorr", "x4_shard").foreach { n =>
      val p = plan(n)
      val exchanges = "Exchange (hash|range)partitioning".r
        .findAllIn(p).size
      assert(exchanges <= 3,
        s"$n should need at most spread + one keyed exchange + ORDER BY, got $exchanges:\n$p")
    }
  }
}
