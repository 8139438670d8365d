package graft.tools

import org.apache.spark.sql.functions._

/** Interleaved A/B for VERDICT r14 #2 (kTrussPeel round-1 driver-job
  * fusion): the Bloom-sketch head() and the wedge-pivot degree-sum head()
  * run back-to-back (pre-r15 shape) vs submitted concurrently from two
  * threads (shipped r15 shape — guide §2.6). Both arms compute identical
  * values (asserted); the probe times ONLY the two small jobs over the
  * pinned oriented edge set, isolating the mechanism from the wedge
  * enumeration that dominates the gate.
  *
  * Usage: runMain graft.tools.TrussFuseProbe [reps]
  */
object TrussFuseProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-truss-fuse-probe")
    import org.apache.spark.sql.graft.BloomOps
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
    val e0P = org.apache.spark.sql.graft.FreshCheckpoint.pinned(oriented)
    val e = e0P.df
    val eRows = e0P.rows

    def dd = e.select(col("s").as("id"), lit(1L).as("o"), lit(0L).as("i"))
      .unionByName(
        e.select(col("t").as("id"), lit(0L).as("o"), lit(1L).as("i")))
      .groupBy("id").agg(sum("o").as("dout"), sum("i").as("din"))
    def sketchJob(): Array[Byte] =
      e.agg(BloomOps.bloomAgg(struct(col("s"), col("t")),
          math.max(eRows, 1L), 0.01).as("bf"))
        .head().getAs[Array[Byte]]("bf")
    def pivotJob(): org.apache.spark.sql.Row =
      dd.agg(
        sum((col("din") * col("dout")).cast("decimal(38,0)")).as("wio"),
        sum((col("dout") * (col("dout") - 1)).cast("decimal(38,0)"))
          .as("woo")).head()

    def seqArm(): (Int, String) = {
      val s = sketchJob(); val w = pivotJob()
      (s.length, w.toString)
    }
    def concArm(): (Int, String) = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val sf = Future(sketchJob()); val wf = Future(pivotJob())
      (Await.result(sf, Duration.Inf).length,
        Await.result(wf, Duration.Inf).toString)
    }
    val a = seqArm(); val b = concArm()
    require(a == b, s"arms disagree: seq=$a conc=$b")
    def run(f: () => (Int, String)): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    run(seqArm _); run(concArm _) // warmup
    val ss = scala.collection.mutable.ArrayBuffer.empty[Double]
    val cs = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) { ss += run(seqArm _); cs += run(concArm _) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString(",")
    System.err.println(s"[truss-fuse] edges=$eRows " +
      s"seq=[${fmt(ss.toSeq)}] conc=[${fmt(cs.toSeq)}]")
    spark.stop()
  }
}
