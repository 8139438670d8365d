package graft.tools

import graft.Sessions
import graft.model.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Stage-level timing of x2_reclink_resolve at sf0.1 (round 8, carried
  * from the round-6 +56% flag): Fellegi–Sunter pair scoring vs
  * min-label resolve vs the final rollup, plus the resolve round count —
  * is the delta plan work or per-round checkpoint fixed cost?
  */
object ReclinkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (pass <- 1 to 3) {
      val cust = Tables.load(spark, sfDir, "customer")
      val pairs = Dedup.fieldMatchPairs(cust, "c_custkey", "c_nationkey",
        Seq(col("c_mktsegment") -> 3L,
          floor(col("c_acctbal") / lit(500)) -> 2L),
        minScore = 5L)
      val n = timed(s"pairs-only p$pass") { pairs.count() }
      println(s"PROBE n_pairs=$n")
      val pairsCached = pairs.localCheckpoint(true)
      timed(s"resolve-only p$pass") {
        Dedup.resolveClusters(cust, "c_custkey", pairsCached).count()
      }
      timed(s"rollup-only p$pass") {
        val labels = Dedup.resolveClusters(cust, "c_custkey", pairsCached)
        cust.join(labels, cust("c_custkey") === labels("id"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_records"),
            countDistinct("cluster").as("n_entities"))
          .orderBy("c_nationkey").count()
      }
      timed(s"full-gate p$pass") {
        val p2 = Dedup.fieldMatchPairs(cust, "c_custkey", "c_nationkey",
          Seq(col("c_mktsegment") -> 3L,
            floor(col("c_acctbal") / lit(500)) -> 2L),
          minScore = 5L)
        val labels = Dedup.resolveClusters(cust, "c_custkey", p2)
        cust.join(labels, cust("c_custkey") === labels("id"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_records"),
            countDistinct("cluster").as("n_entities"))
          .orderBy("c_nationkey").count()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
