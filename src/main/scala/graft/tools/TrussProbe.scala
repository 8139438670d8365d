package graft.tools

import org.apache.spark.sql.functions._

/** Crossover probe for kTrussPeel's deltaFrac knob (round 8): at what
  * removal fraction does incremental support maintenance stop beating a
  * full survivor re-enumeration? Runs a DEEP peel (rounds=6 — the first
  * peel removes a flood, later rounds remove slivers) over the sf
  * co-purchase graph at a sweep of deltaFrac values; the best total
  * locates the crossover region. deltaFrac=0 → always re-enumerate;
  * deltaFrac=1 → round-7 behavior (always delta when removals <=
  * survivors). Not part of the driver contract; kept so the PLANS.md
  * measurement is reproducible.
  */
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-truss-probe")
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
    for (frac <- Seq(0.0, 0.03, 0.06, 0.125, 0.25, 0.5, 1.0);
         pass <- 1 to 2) {
      clear()
      val t0 = System.nanoTime()
      val n = graft.operators.Graph
        .kTrussPeel(pairs, k = 10L, rounds = 6, deltaFrac = frac).count()
      System.err.println(f"[probe] deltaFrac=$frac pass$pass: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
