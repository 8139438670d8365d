package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Probe: why / whether dynamic partition pruning fires on a
  * partitioned-fact × filtered-dim join (used while building s11_dpp).
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._
    val fact = graft.Scratch.fresh("dppprobe-fact")
    val dimP = graft.Scratch.fresh("dppprobe-dim")
    (1 to 20000).map(i => (i.toLong, s"p${i % 4}")).toDF("id", "part")
      .write.mode("overwrite").partitionBy("part").parquet(fact)
    Seq(("p0", "hot"), ("p1", "hot"), ("p2", "cold"), ("p3", "cold"))
      .toDF("p", "tier").write.mode("overwrite").parquet(dimP)
    val joined = spark.read.parquet(fact)
      .join(spark.read.parquet(dimP).filter($"tier" === "hot"),
        $"part" === $"p")
    println("=== OPTIMIZED ===")
    println(joined.queryExecution.optimizedPlan.toString)
    println("=== PHYSICAL ===")
    println(joined.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
