package graft.tools
import graft.Sessions
import graft.operators.{Par, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Per-round timing of the star-contraction resolveClusters loop on the
  * sf1 x3_dbscan core-pair graph (round 12). Breaks each round into pin
  * (plan+execute) and the convergence anti-join. Measured: 6 rounds,
  * round 0 (the full 3.19M-edge set) 15.6 s, later rounds 2–3.6 s —
  * loop total 38.0 s vs the pointer-jump baseline's 67.0 s in the same
  * minute (DbscanProbe3; PLANS round 12). NOTE: that 38.0 s baseline was
  * recorded with a `.distinct()` on e0 that the shipped resolveClusters
  * deliberately skips (dup-safe round 0); the distinct was dropped here
  * in round 13 so replays time the shipped round-0 path exactly —
  * compare future numbers against fresh A/Bs, not the 38.0 s mark.
  */
object DbscanProbe4star {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = Sessions.local("32")
    val (eps, minPts) = (0.05, 4)
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
    val nbr0 = half.unionByName(
        half.select(col("ib").as("ia"), col("ia").as("ib")))
    val cores = nbr0.groupBy(col("ia").as("id"))
      .agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") + 1 >= minPts)
      .select("id")
      .persist(lvl)
    cores.count()
    val pairs = nbr0.filter(col("ia") < col("ib"))
      .join(cores.withColumnRenamed("id", "ia"), "ia")
      .join(cores.withColumnRenamed("id", "ib"), "ib")
      .select(col("ia").as("da"), col("ib").as("db"))

    // --- star loop with clocks ---
    def clock[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val e0 = pairs.select(
        least(col("da").cast("long"), col("db").cast("long")).as("a"),
        greatest(col("da").cast("long"), col("db").cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
    val (pin0, t0s) = clock(org.apache.spark.sql.graft.FreshCheckpoint.pinned(e0))
    println(f"ROUND e0 pin=$t0s%.2f rows=${pin0.rows}")
    var pin = pin0
    var e = pin.df
    var rows = pin.rows
    var converged = rows == 0L
    var round = 0
    while (!converged && round < 25) {
      val nbr = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val mL = nbr.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val e1 = nbr.join(mL, "u").filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
      val nbr1 = e1.select(col("b").as("u"), col("a").as("v"))
      val mS = nbr1.groupBy("u").agg(min("v").as("m"))
      val next = nbr1.join(mS, "u")
        .filter(col("m") =!= col("v"))
        .select(col("m").as("a"), col("v").as("b"))
        .unionByName(mS.select(col("m").as("a"), col("u").as("b")))
        .distinct()
      val (nextPin, tp) = clock(org.apache.spark.sql.graft.FreshCheckpoint.pinned(next))
      var ta = 0.0
      if (nextPin.rows == rows) {
        val (c, t) = clock(
          nextPin.df.join(e, Seq("a", "b"), "left_anti").isEmpty)
        converged = c; ta = t
      }
      println(f"ROUND $round pin=$tp%.2f anti=$ta%.2f rows=${nextPin.rows}")
      pin.rdd.unpersist(blocking = false)
      pin = nextPin; e = pin.df; rows = nextPin.rows
      round += 1
    }
    println(s"rounds=$round converged=$converged")
    spark.stop()
  }
}
