package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan evidence for the r15 frontier-broadcast change: the x8_bfs gate's
  * OUTER plan is a flat checkpoint leaf (the rounds execute eagerly inside
  * bfsHops), so the join-strategy claim lives in the ROUND plans — and the
  * two code paths hand the planner DIFFERENT information, which this dump
  * reproduces faithfully:
  *
  *  - BEFORE (pre-r15 loop): nothing materializes until the final action,
  *    so round 2's frontier is a lazy join→distinct→anti-join chain whose
  *    SIZE ESTIMATE is join-inflated — the planner sort-merge-joins it
  *    against the persisted edge list (re-sorting the edge partitions
  *    every round). Dumped as the full 2-round lazy plan, exactly what
  *    the old code executed at its final action.
  *  - AFTER (shipped): each round's frontier is persisted, counted (the
  *    broadcast-bound branch) and explicitly broadcast under the bound —
  *    the round-2 join is a BroadcastHashJoin by construction, not by
  *    estimate. Dumped with the operands in the materialization state the
  *    shipped loop really has them in.
  *
  * Usage: runMain graft.tools.FrontierPlanDump
  */
object FrontierPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-frontier-plan-dump")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def fmt(d: DataFrame): String =
      d.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    def edgesAndSeeds(): (DataFrame, DataFrame) = {
      val li = graft.model.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
      val pairs = li.as("a").join(li.as("b"), "l_orderkey")
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
        .repartition(col("src")).persist(lvl)
      val seeds = edges.select(col("src").cast("long").as("id"))
        .distinct().filter(col("id") % 100 === 0)
        .select(col("id"), lit(0L).as("hop"))
      (e, seeds)
    }

    // BEFORE: the pre-r15 2-round loop, fully lazy — this is the plan the
    // final action executed (persists marked, nothing yet materialized).
    {
      val (e, seeds) = edgesAndSeeds()
      var dist = seeds.distinct().persist(lvl)
      var frontier = dist
      for (h <- 1 to 2) {
        val next = e.join(frontier.withColumnRenamed("id", "src")
            .select("src"), "src")
          .select(col("dst").as("id")).distinct()
          .join(dist, Seq("id"), "left_anti")
          .select(col("id"), lit(h.toLong).as("hop"))
          .persist(lvl)
        dist = dist.unionByName(next).persist(lvl)
        frontier = next
      }
      println("===== x8_bfs BEFORE: 2-round lazy loop plan " +
        "(what the pre-r15 final action executed) =====")
      println(fmt(dist))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    // AFTER: the shipped round-2 join with operands in the state the
    // shipped loop holds them — round-1 frontier materialized + counted,
    // broadcast under the bound; settled set likewise.
    {
      val (e, seeds) = edgesAndSeeds()
      val dist0 = seeds.distinct().persist(lvl)
      dist0.count(); e.count()
      val f1 = e.join(broadcast(dist0.withColumnRenamed("id", "src")
          .select("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(broadcast(dist0.select("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(1L).as("hop")).persist(lvl)
      f1.count()
      val dist1 = dist0.unionByName(f1).persist(lvl)
      val round2 = e.join(broadcast(f1.withColumnRenamed("id", "src")
          .select("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(broadcast(dist1.select("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(2L).as("hop"))
      println("===== x8_bfs AFTER: shipped round-2 join " +
        "(frontier counted + broadcast under the 4M-row bound) =====")
      println(fmt(round2))
    }
    spark.stop()
  }
}
