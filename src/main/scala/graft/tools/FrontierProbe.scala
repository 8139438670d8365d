package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interleaved A/B (EdgeSymProbe protocol) for the r15 frontier-broadcast
  * change in Graph.bfsHops/ssspRounds: the OLD per-round shape (frontier
  * shuffle-joined against the pre-partitioned edge list, no per-round
  * count, fixed round count) vs the SHIPPED shape (frontier counted per
  * round, broadcast under the row bound, early exit on empty frontier).
  * Both arms run on the x8_bfs / x8_sssp gate shapes (lineitem co-order
  * graph). Output equality is asserted before timing.
  *
  * Usage: runMain graft.tools.FrontierProbe [bfs|sssp] [reps]
  */
object FrontierProbe {

  /** The pre-r15 bfsHops loop, verbatim. */
  private def bfsOld(edges: DataFrame, sources: DataFrame,
                     maxHops: Int): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val retained = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def pin(d: DataFrame): DataFrame = { retained += d.persist(lvl); d }
    val e = pin(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .repartition(col("src")))
    var dist = pin(sources.select(col("id").cast("long").as("id"),
      lit(0L).as("hop")).distinct())
    var frontier = dist
    for (h <- 1 to maxHops) {
      val next = pin(e.join(frontier.withColumnRenamed("id", "src")
          .select("src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .select(col("id"), lit(h.toLong).as("hop")))
      dist = pin(dist.unionByName(next))
      frontier = next
    }
    val out = org.apache.spark.sql.graft.FreshCheckpoint(dist)
    retained.foreach(_.unpersist(blocking = false))
    out
  }

  /** The pre-r15 ssspRounds loop, verbatim. */
  private def ssspOld(edges: DataFrame, sources: DataFrame,
                      rounds: Int): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val retained = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def pin(d: DataFrame): DataFrame = { retained += d.persist(lvl); d }
    val e = pin(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .repartition(col("src")))
    var dist = pin(sources.select(col("id").cast("long").as("id"),
      lit(0L).as("dist")).distinct())
    var frontier = dist
    for (_ <- 1 to rounds) {
      val cand = e.join(frontier.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("dist") + col("w")).as("cand"))
      val improved = pin(cand.join(dist, Seq("id"), "left_outer")
        .filter(col("dist").isNull || col("cand") < col("dist"))
        .select(col("id"), col("cand").as("dist")))
      dist = pin(dist.join(improved.select(col("id"), col("dist").as("nd")),
          Seq("id"), "full_outer")
        .select(col("id"), coalesce(col("nd"), col("dist")).as("dist")))
      frontier = improved
    }
    val out = org.apache.spark.sql.graft.FreshCheckpoint(dist)
    retained.foreach(_.unpersist(blocking = false))
    out
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("bfs")
    val reps = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = s"graft-frontier-probe-$which")

    def bfsEdges(): (DataFrame, DataFrame) = {
      val li = graft.model.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
      val pairs = li.as("a").join(li.as("b"), "l_orderkey")
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val seeds = edges.select(col("src").as("id")).distinct()
        .filter(col("id") % 100 === 0)
      (edges, seeds)
    }
    def ssspEdges(): (DataFrame, DataFrame) = {
      val li = graft.model.Tables.load(spark, dir, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select("l_orderkey", "l_partkey").distinct()
      val pairs = li.as("a").join(li.as("b"), "l_orderkey")
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        .withColumn("w", lit(1L) + (col("src") + col("dst")) % 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val seeds = edges.select(col("src").as("id")).distinct()
        .filter(col("id") % 100 === 0)
      (edges, seeds)
    }

    def oldArm(): DataFrame = which match {
      case "sssp" => val (e, s) = ssspEdges(); ssspOld(e, s, 3).orderBy("id")
      case _ => val (e, s) = bfsEdges(); bfsOld(e, s, 2).orderBy("id")
    }
    def newArm(): DataFrame = which match {
      case "sssp" =>
        val (e, s) = ssspEdges()
        graft.operators.Graph.ssspRounds(e, s, 3).orderBy("id")
      case _ =>
        val (e, s) = bfsEdges()
        graft.operators.Graph.bfsHops(e, s, 2).orderBy("id")
    }

    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def run(d: => DataFrame): Double = {
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      scrub(); dt
    }
    // Output-equality gate: exact set equality both directions.
    val a = oldArm().collect().map(_.toSeq).toSet
    scrub()
    val b = newArm().collect().map(_.toSeq).toSet
    scrub()
    require(a == b,
      s"arms disagree: old=${a.size} rows, new=${b.size} rows, " +
        s"onlyOld=${(a -- b).take(3)}, onlyNew=${(b -- a).take(3)}")
    run(oldArm()); run(newArm()) // warmup
    val os = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ns = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) { os += run(oldArm()); ns += run(newArm()) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(",")
    System.err.println(s"[frontier-$which] rows=${a.size} " +
      s"old=[${fmt(os.toSeq)}] new=[${fmt(ns.toSeq)}]")
    spark.stop()
  }
}
