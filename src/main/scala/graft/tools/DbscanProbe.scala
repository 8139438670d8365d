package graft.tools
import graft.Sessions
import graft.operators.{Dedup, Density, Par, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Phase timing for the x3_dbscan gate at an arbitrary SF — decomposes
  * the wall into pair generation / core test / core-pair build /
  * resolveClusters / border assignment to find which phase carries the
  * sf0.1→sf1 scaling.
  */
object DbscanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    if (sys.env.contains("PROBE_NOAQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
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
    timed("load")(v.count())
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val probes = v.select(col("id").as("ia"), col("v").as("va"),
        col("cx"), col("cy"), explode(array(offsets: _*)).as("o"))
      .select(col("ia"), col("va"),
        (col("cx") + col("o.dx")).as("px"), (col("cy") + col("o.dy")).as("py"))
    val nbr = probes.join(
        v.select(col("id").as("ib"), col("v").as("vb"),
          col("cx"), col("cy")),
        col("px") === col("cx") && col("py") === col("cy") &&
          col("ia") =!= col("ib"))
      .filter(d2(col("va"), col("vb")) <= lit(eps * eps))
      .select("ia", "ib")
      .persist(lvl)
    println("nbr rows=" + timed("nbr")(nbr.count()))
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
      .persist(lvl)
    println("corePairs=" + timed("corePairs")(corePairs.count()))
    // Round-instrumented replica of Dedup.resolveClusters' loop.
    timed("resolve-instrumented") {
      val sc = spark.sparkContext
      val edges0 = corePairs.select(explode(array(
          struct(col("da").as("src"), col("db").as("dst")),
          struct(col("db").as("src"), col("da").as("dst")),
          struct(col("da").as("src"), col("da").as("dst")),
          struct(col("db").as("src"), col("db").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val edges = (if (sys.env.contains("PROBE_PREPART"))
        edges0.repartition(col("dst")) else edges0).persist(lvl)
      val blockingUnpersist = sys.env.contains("PROBE_BLOCKING")
      var liveCkpt: scala.collection.Set[Int] = Set.empty[Int]
      def checkpointed(d: org.apache.spark.sql.DataFrame) = {
        val before = sc.getPersistentRDDs.keySet
        val out = org.apache.spark.sql.graft.FreshCheckpoint(d)
        val added = sc.getPersistentRDDs.keySet.toSet -- before
        liveCkpt.foreach(i =>
          sc.getPersistentRDDs.get(i)
            .foreach(_.unpersist(blocking = blockingUnpersist)))
        liveCkpt = added
        out
      }
      def labelSum(l: org.apache.spark.sql.DataFrame) = {
        val d = l.agg(sum(col("cluster").cast("decimal(38,0)")))
          .head().getDecimal(0)
        if (d == null) java.math.BigDecimal.ZERO else d
      }
      var labels = timed("r0-init")(checkpointed(edges
        .groupBy(col("src").as("id")).agg(min("dst").as("cluster"))))
      var prevSum = labelSum(labels)
      var round = 0
      var changed = 1L
      while (changed > 0 && round < 25) {
        val prop = timed(s"r$round-prop")(checkpointed(edges
          .join(labels.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id")).agg(min("cluster").as("cluster"))))
        val propSum = timed(s"r$round-sum")(labelSum(prop))
        if (propSum.compareTo(prevSum) == 0) { changed = 0L; labels = prop }
        else {
          val jump1 = prop.as("a")
            .join(prop.select(col("id").as("cluster"),
              col("cluster").as("cc")).as("b"), "cluster")
            .select(col("id"), col("cc").as("cluster"))
          val jdf =
            if (sys.env.contains("PROBE_JUMP2"))
              jump1.as("a")
                .join(prop.select(col("id").as("cluster"),
                  col("cluster").as("cc")).as("b"), "cluster")
                .select(col("id"), col("cc").as("cluster"))
            else jump1
          val next = timed(s"r$round-jump")(checkpointed(jdf))
          println(s"rSTATS $round parts=${next.rdd.getNumPartitions} " +
            s"persisted=${sc.getPersistentRDDs.size} " +
            s"sizeInBytesBits=" +
            next.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength)
          prevSum = timed(s"r$round-sum2")(labelSum(next))
          labels = next
        }
        round += 1
      }
      println(s"ROUNDS $round")
      edges.unpersist()
    }
    val clusters = timed("resolveClusters") {
      val c = Dedup.resolveClusters(cores, "id", corePairs)
      c.count(); c
    }
    timed("border+union") {
      val border = nbr
        .join(cores.withColumnRenamed("id", "ib"), "ib")
        .join(cores.withColumnRenamed("id", "ia"), Seq("ia"), "left_anti")
        .join(clusters.select(col("id").as("ib"), col("cluster")), "ib")
        .groupBy(col("ia").as("id"))
        .agg(min(col("cluster")).as("cluster"))
      clusters.select(col("id"), col("cluster"), lit(true).as("is_core"))
        .unionByName(border.select(col("id"), col("cluster"),
          lit(false).as("is_core")))
        .count()
    }
    spark.stop()
  }
}
