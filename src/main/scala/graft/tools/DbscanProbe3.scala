package graft.tools
import graft.Sessions
import graft.operators.{Par, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Per-round timing of the r3–r11 pointer-jump resolveClusters loop on
  * the sf1 x3_dbscan core-pair graph, preserved verbatim as the A/B
  * BASELINE for the round-12 star-contraction rewrite (the shipped
  * operator no longer contains this loop). DbscanProbe2 showed resolve =
  * 51.6 s of a ~67 s cold wall with a flat stage profile; this probe
  * exposed why: 23 prop/jump rounds (min-label moves one hop per round
  * across local-min basin boundaries), each costing 0.7–3 s of Catalyst
  * planning against 0.3 s of execution. Same-minute A/B vs the star loop
  * (DbscanProbe4star): 67.0 s vs 38.0 s (PLANS round 12).
  */
object DbscanProbe3 {
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
    v.count()
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
    half.count()
    val nbr = half.unionByName(
        half.select(col("ib").as("ia"), col("ia").as("ib")))
    val cores = nbr.groupBy(col("ia").as("id"))
      .agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") + 1 >= minPts)
      .select("id")
      .persist(lvl)
    cores.count()
    val pairs = nbr.filter(col("ia") < col("ib"))
      .join(cores.withColumnRenamed("id", "ia"), "ia")
      .join(cores.withColumnRenamed("id", "ib"), "ib")
      .select(col("ia").as("da"), col("ib").as("db"))

    // ---- resolveClusters replica with per-round clocks ----
    val edges = timed("edges-build")({
      val e = pairs.select(explode(array(
          struct(col("da").cast("long").as("src"), col("db").cast("long").as("dst")),
          struct(col("db").cast("long").as("src"), col("da").cast("long").as("dst")),
          struct(col("da").cast("long").as("src"), col("da").cast("long").as("dst")),
          struct(col("db").cast("long").as("src"), col("db").cast("long").as("dst"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .repartition(col("dst"))
        .persist(lvl)
      e.count()
      e
    })
    var livePin: List[() => Unit] = Nil
    def labelSum(l: org.apache.spark.sql.DataFrame): java.math.BigDecimal = {
      val d = l.agg(sum(col("cluster").cast("decimal(38,0)"))).head().getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    def pinRound(tag: String, d: org.apache.spark.sql.DataFrame)
        : (org.apache.spark.sql.DataFrame, java.math.BigDecimal) = {
      val t0 = System.nanoTime()
      val p = org.apache.spark.sql.graft.FreshCheckpoint.lazyPinned(d)
      val tPlan = System.nanoTime()
      val s = labelSum(p.df)
      val tForce = System.nanoTime()
      livePin.foreach(f => f())
      livePin = List(() => p.rdd.unpersist(blocking = false))
      println(f"ROUND $tag plan=${(tPlan - t0) / 1e9}%.2f force=${(tForce - tPlan) / 1e9}%.2f s")
      (p.df, s)
    }
    var (labels, prevSum) = pinRound("init", edges
      .groupBy(col("src").as("id")).agg(min("dst").as("cluster")))
    var round = 0
    var changed = 1L
    while (changed > 0 && round < 25) {
      val (prop, propSum) = pinRound(s"prop$round", edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(min("cluster").as("cluster")))
      if (propSum.compareTo(prevSum) == 0) {
        changed = 0L
        labels = prop
      } else {
        val (next, nextSum) = pinRound(s"jump$round", prop.as("a")
          .join(prop.select(col("id").as("cluster"), col("cluster").as("cc"))
            .as("b"), "cluster")
          .select(col("id"), col("cc").as("cluster")))
        prevSum = nextSum
        labels = next
      }
      round += 1
    }
    println(s"rounds=$round converged=${changed == 0}")
    spark.stop()
  }
}
