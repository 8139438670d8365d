package graft.tools

import org.apache.spark.sql.functions._

/** Phase profile of the Bloom-pipelined k-truss support path (round 8):
  * e0 build, sketch agg, pivot sums, wedge+confirm enumeration, credit
  * aggregate — locates the next bottleneck after the wedge-sort removal.
  */
object TrussProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = graft.Sessions.local(app = "graft-truss-probe3")
    import org.apache.spark.sql.graft.BloomOps
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = graft.model.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey")
    val pairs = li.as("a").join(li.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
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
    val e0 = time("e0 checkpoint")(
      org.apache.spark.sql.graft.FreshCheckpoint.pinned(oriented))
    val e = e0.df
    val sketch = time("bloom agg")(
      e.agg(BloomOps.bloomAgg(struct(col("s"), col("t")),
          e0.rows, 0.01).as("bf")).head().getAs[Array[Byte]]("bf"))
    System.err.println(s"[probe] sketch bytes=${sketch.length}")
    val dd = e.select(col("s").as("id"), lit(1L).as("o"), lit(0L).as("i"))
      .unionByName(
        e.select(col("t").as("id"), lit(0L).as("o"), lit(1L).as("i")))
      .groupBy("id").agg(sum("o").as("dout"), sum("i").as("din"))
    val w = time("pivot sums")(dd.agg(
      sum((col("din") * col("dout")).cast("decimal(38,0)")).as("wio"),
      sum((col("dout") * (col("dout") - 1)).cast("decimal(38,0)"))
        .as("woo")).head())
    System.err.println(s"[probe] wio=${w.getDecimal(0)} woo=${w.getDecimal(1)}")
    for (pivot <- Seq("source", "middle")) {
      val wedges =
        if (pivot == "source")
          e.as("e1").join(e.as("e2"),
              col("e1.s") === col("e2.s") && col("e1.t") =!= col("e2.t"))
            .select(col("e1.s").as("a"), col("e1.t").as("b"),
              col("e2.t").as("c"))
        else
          e.as("e1").join(e.as("e2"), col("e1.t") === col("e2.s"))
            .select(col("e1.s").as("a"), col("e1.t").as("b"),
              col("e2.t").as("c"))
      val (ms, mt) = if (pivot == "source") ("b", "c") else ("a", "c")
      val tri = wedges
        .filter(BloomOps.mightContain(lit(sketch), struct(col(ms), col(mt))))
        .join(e.as("e3"),
          col(ms) === col("e3.s") && col(mt) === col("e3.t"))
        .select(col("a"), col("b"), col("c"))
      val n = time(s"wedge+confirm ($pivot pivot)")(tri.count())
      System.err.println(s"[probe] triangles=$n")
      val sup = tri.select(explode(array(
          struct(col("a").as("s"), col("b").as("t")),
          struct(col("b").as("s"), col("c").as("t")),
          struct(col("a").as("s"), col("c").as("t")))).as("__e"))
        .groupBy(col("__e.s").as("s"), col("__e.t").as("t"))
        .agg(count(lit(1)).as("sup"))
      time(s"enum+credit ($pivot pivot)")(
        System.err.println("[probe] survivors=" +
          sup.filter(col("sup") >= 8).count()))
    }
    spark.stop()
  }
}
