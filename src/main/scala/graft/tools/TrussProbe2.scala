package graft.tools

import org.apache.spark.sql.functions._

/** Phase profile of the k-truss gate at a given SF (round 8): where do
  * the seconds go — canonical edge build + orientation (e0), round-1
  * support (wedge join + crediting), or the round-2 recount? Guides the
  * supportOf rework aimed at the sf1 < 30 s bar.
  */
object TrussProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = graft.Sessions.local(app = "graft-truss-probe2")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    val li = graft.model.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey")
    val pairs = li.as("a").join(li.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    for (pass <- 1 to 2) {
      clear()
      val simple = pairs.select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .filter(col("u") < col("v")).distinct()
      val deg = simple.select(explode(array(col("u"), col("v"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val oriented = simple
        .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
        .select(
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
            struct(col("u").as("s"), col("v").as("t")))
            .otherwise(struct(col("v").as("s"), col("u").as("t")))
            .as("__o"))
        .select(col("__o.s").as("s"), col("__o.t").as("t"))
      val e0 = time(s"e0 checkpoint pass$pass")(
        org.apache.spark.sql.graft.FreshCheckpoint.pinned(oriented))
      System.err.println(s"[probe] e0 rows=${e0.rows}")
      val tri = e0.df.as("e1")
        .join(e0.df.as("e2"), col("e1.t") === col("e2.s"))
        .join(e0.df.as("e3"),
          col("e3.s") === col("e1.s") && col("e3.t") === col("e2.t"))
        .select(col("e1.s").as("a"), col("e1.t").as("b"),
          col("e2.t").as("c"))
      val nTri = time(s"triangle count pass$pass")(tri.count())
      System.err.println(s"[probe] triangles=$nTri")
      val sup = tri.select(explode(array(
          struct(col("a").as("s"), col("b").as("t")),
          struct(col("b").as("s"), col("c").as("t")),
          struct(col("a").as("s"), col("c").as("t")))).as("__e"))
        .groupBy(col("__e.s").as("s"), col("__e.t").as("t"))
        .agg(count(lit(1)).as("sup"))
      val nSup = time(s"round1 support (enum+credit) pass$pass")(
        sup.filter(col("sup") >= 8).count())
      System.err.println(s"[probe] survivors=$nSup")
      e0.rdd.unpersist(blocking = true)
      clear()
      time(s"full gate rounds=2 pass$pass")(
        System.err.println("rows=" + graft.operators.Graph
          .kTrussPeel(pairs, k = 10L, rounds = 2).count()))
    }
    spark.stop()
  }
}
