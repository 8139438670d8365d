package graft.tools

import graft.Sessions
import graft.model.Tables
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 adjudication of the r12 reclink watch item (VERDICT r12 #5):
  * star contraction's round 0 pays the FULL pair set on dense
  * diameter-<=2 graphs (the sf1 record-linkage graph: ~4.5M pairs over
  * near-clique blocking groups), where one min-label round would collapse
  * almost everything first.
  *
  * A/B, interleaved in the same JVM with scrubs between sides (the
  * dbscan-protocol shape): per pass,
  *   A = shipped [[Dedup.resolveClusters]] (pure star contraction);
  *   B = hybrid — one min-label round (lbl(u) = min(u, min nbr(u)),
  *       duplicate-safe under min like star round 0), contract the pair
  *       set to label space, run the shipped star contraction on the
  *       residual, compose labels back.
  * Pass 0 also equality-checks the two label maps (same (id, cluster)
  * set) so a hybrid speed win can never be a correctness trade.
  * Decision rule per VERDICT: change the shipped operator only if the
  * hybrid clears the recorded noise floor (the watch item itself is
  * ~+1 s inside variance).
  */
object ReclinkProbe2 {
  private def hybridResolve(df: DataFrame, idCol: String,
                            pairs: DataFrame): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("id"))
    val e0 = pairs.select(
        least(col("da").cast("long"), col("db").cast("long")).as("a"),
        greatest(col("da").cast("long"), col("db").cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
    // One min-label round over the doubled neighbor view: every
    // non-isolated node learns min(self, neighbors) — on a clique this
    // IS the component min already.
    val nbr = e0.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e0.select(col("b").as("u"), col("a").as("v")))
    val lbl = nbr.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("l"))
    val pinL = org.apache.spark.sql.graft.FreshCheckpoint.pinned(lbl)
    val m = pinL.df
    // Contract edges to label space; the residual is non-empty exactly
    // where two basins met without seeing each other's min.
    val e1 = e0
      .join(m.select(col("u").as("a"), col("l").as("la")), "a")
      .join(m.select(col("u").as("b"), col("l").as("lb")), "b")
      .filter(col("la") =!= col("lb"))
      .select(col("la").as("da"), col("lb").as("db"))
    val labelIds = m.select(col("l").as("lid")).distinct()
    val star = Dedup.resolveClusters(
      labelIds.withColumnRenamed("lid", "id"), "id", e1)
    val composed = m
      .join(star.withColumnRenamed("id", "l"), "l")
      .select(col("u").as("id"), col("cluster"))
    // pinL's blocks stay live — the returned plan reads them lazily
    // (same contract as resolveClusters' final round); the probe's scrub
    // releases them after each timed action.
    composed.unionByName(
      ids.join(composed.select("id"), Seq("id"), "left_anti")
        .withColumn("cluster", col("id")))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    val cust = Tables.load(spark, sfDir, "customer")
    val rawPairs = Dedup.fieldMatchPairs(cust, "c_custkey", "c_nationkey",
      Seq(col("c_mktsegment") -> 3L,
        floor(col("c_acctbal") / lit(500)) -> 2L),
      minScore = 5L)
    // Equality check once, outside the timed passes.
    val a0 = Dedup.resolveClusters(cust, "c_custkey", rawPairs)
    val b0 = hybridResolve(cust, "c_custkey", rawPairs)
    val diff = a0.withColumnRenamed("cluster", "ca")
      .join(b0.withColumnRenamed("cluster", "cb"), "id")
      .filter(col("ca") =!= col("cb")).count()
    println(s"PROBE label-diff=$diff (must be 0)")
    scrub()
    for (pass <- 1 to 3) {
      // Star first on odd passes, hybrid first on even — neither side
      // always pays the colder cache.
      val order: Seq[(String, () => Long)] = {
        val a = "star" -> (() =>
          Dedup.resolveClusters(cust, "c_custkey", rawPairs).count())
        val b = "hybrid" -> (() =>
          hybridResolve(cust, "c_custkey", rawPairs).count())
        if (pass % 2 == 1) Seq(a, b) else Seq(b, a)
      }
      order.foreach { case (name, f) =>
        timed(s"$name p$pass") { f() }
        scrub()
      }
    }
    spark.stop()
  }
}
