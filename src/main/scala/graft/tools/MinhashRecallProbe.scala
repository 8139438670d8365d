package graft.tools

import graft.{Scratch, Sessions}
import org.apache.spark.sql.SparkSession

/** Measures the xxhash64 fast-path LSH recall for the three x2_minhash_*
  * verdict-gate configs (PLANS round 14): the gates assert
  * `recall >= bound`, and the bound must sit below the MEASURED recall at
  * every shipped scale with margin, not at the s-curve's idealized value.
  * Prints one line per (k, bands): n_truth, n_cand, n_hit, recall.
  *
  * Usage: runMain graft.tools.MinhashRecallProbe <sfDir>
  */
object MinhashRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession = Sessions.withDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("minhash-recall-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", Scratch.warehouse)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables.load(spark, dir, "documents")
    for ((k, bands) <- Seq((16, 4), (64, 16), (128, 32))) {
      val row = graft.operators.Dedup.lshRecall(docs, "doc_id", "text",
        n = 3, k = k, bands = bands, threshold = 0.8, portable = false)
        .collect().head
      println(s"MHRECALL dir=$dir k=$k bands=$bands " +
        s"n_truth=${row.getLong(0)} n_cand=${row.getLong(1)} " +
        s"n_hit=${row.getLong(2)} recall=${row.getDouble(3)}")
    }
    spark.stop()
  }
}
