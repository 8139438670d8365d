package graft.tools
import graft.Sessions
import graft.operators.{Dedup, Par, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Phase timing for the CURRENT (r11 half-neighborhood) x3_dbscan shape
  * at an arbitrary SF — DbscanProbe predates the half-probe rework and
  * times the old 9-offset join, so its attribution no longer matches the
  * shipped operator. Forces each persisted table in pipeline order and
  * counts resolveClusters rounds via the job log, to locate the flat
  * ~200-stage profile the round-12 StageProbe recorded (no stage > 3.5 s
  * of a ~100 s cold wall).
  */
object DbscanProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = Sessions.local("32")
    val (eps, minPts) = (0.05, 4)
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val d2: (Column, Column) => Column = (a, b) =>
      Similarity.dot(a, a) - lit(2.0) * Similarity.dot(a, b) +
        Similarity.dot(b, b)
    val pts = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id").as("id"),
        array(col("user_id").cast("double"),
          col("value") / lit(100.0)).as("pt"))
    val v = Par.spread(pts)
      .select(col("id").cast("long").as("id"),
        col("pt").cast("array<double>").as("v"))
      .withColumn("cx", floor(element_at(col("v"), 1) / eps).cast("long"))
      .withColumn("cy", floor(element_at(col("v"), 2) / eps).cast("long"))
      .persist(lvl)
    println("v rows=" + timed("load")(v.count()))
    val offsets = Seq((0L, 0L), (1L, 0L), (1L, -1L), (0L, 1L), (1L, 1L))
      .map { case (dx, dy) =>
        struct(lit(dx).as("dx"), lit(dy).as("dy")) }
    val probes = v.select(col("id").as("ia"), col("v").as("va"),
        col("cx"), col("cy"), explode(array(offsets: _*)).as("o"))
      .select(col("ia"), col("va"),
        (col("cx") + col("o.dx")).as("px"), (col("cy") + col("o.dy")).as("py"),
        (col("o.dx") === 0 && col("o.dy") === 0).as("same"))
    val half = probes.join(
        v.select(col("id").as("ib"), col("v").as("vb"),
          col("cx"), col("cy")),
        col("px") === col("cx") && col("py") === col("cy") &&
          (!col("same") || col("ia") < col("ib")))
      .filter(d2(col("va"), col("vb")) <= lit(eps * eps))
      .select("ia", "ib")
      .persist(lvl)
    println("half rows=" + timed("half")(half.count()))
    val nbr = half.unionByName(
        half.select(col("ib").as("ia"), col("ia").as("ib")))
    val cores = nbr.groupBy(col("ia").as("id"))
      .agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") + 1 >= minPts)
      .select("id")
      .persist(lvl)
    println("cores=" + timed("cores")(cores.count()))
    val corePairs = nbr.filter(col("ia") < col("ib"))
      .join(cores.withColumnRenamed("id", "ia"), "ia")
      .join(cores.withColumnRenamed("id", "ib"), "ib")
      .select(col("ia").as("da"), col("ib").as("db"))
    println("corePairs=" + timed("corePairs")(corePairs.count()))
    val clusters = timed("resolve")(
      Dedup.resolveClusters(cores, "id", corePairs))
    println("clusters rows=" + timed("resolveForce")(clusters.count()))
    val border = nbr
      .join(cores.withColumnRenamed("id", "ib"), "ib")
      .join(cores.withColumnRenamed("id", "ia"), Seq("ia"), "left_anti")
      .join(clusters.select(col("id").as("ib"), col("cluster")), "ib")
      .groupBy(col("ia").as("id"))
      .agg(min(col("cluster")).as("cluster"))
    println("border=" + timed("border")(border.count()))
    val out = clusters.select(col("id"), col("cluster"), lit(true).as("is_core"))
      .unionByName(border.select(col("id"), col("cluster"),
        lit(false).as("is_core")))
      .orderBy("id")
    println("out=" + timed("orderBy+count")(out.count()))
    spark.stop()
  }
}
