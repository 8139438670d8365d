package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B probe: symmetrizing the co-order pair list via union-of-reversal
  * (the x8 gates' current shape — relies on AQE exchange reuse to dedupe
  * the two branches' identical distinct subtrees) versus one explode of
  * both directions (a single subtree by construction, the assortativity
  * shape). Runs the two forms INTERLEAVED in one JVM (A B A B ...) so the
  * machine's decaying-background-load confound (PLANS r14: the second of
  * two back-to-back runs systematically wins) cancels instead of biasing
  * one arm. Timed action is the noop sink (guide §1.4).
  */
object EdgeSymProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-edgesym-probe")
    def li = graft.model.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    def pairs = li.as("a").join(li.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    def unionForm = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    def explodeForm = pairs
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    def time(d: DataFrame): Double = {
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc()
      dt
    }
    time(unionForm); time(explodeForm) // warmup, untimed
    val as = scala.collection.mutable.ArrayBuffer.empty[Double]
    val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to 5) { as += time(unionForm); bs += time(explodeForm) }
    def fmt(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString(",")
    System.err.println(s"[edgesym] union=[${fmt(as.toSeq)}] " +
      s"explode=[${fmt(bs.toSeq)}]")
    spark.stop()
  }
}
