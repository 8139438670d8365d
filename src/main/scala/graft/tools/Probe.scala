package graft.tools

import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for bench investigation (not part of the
  * driver contract; kept in-repo so perf work is reproducible).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/testdata/sf1")
    val spark = graft.Sessions.local(app = "graft-probe")
    import graft.operators.Similarity
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = graft.model.Tables.load(spark, dir, "embeddings")
    e.persist(); e.count()
    val ctr = e.filter(col("vec_id") < 8)
    time("warm count")(e.count())
    val res = Similarity.residuals(e, "vec_id", "embedding",
      ctr, "vec_id", "embedding")
    time("residuals.count")(res.count())
    val cbs = time("pqTrain")(
      Similarity.pqTrain(res.filter(col("vec_id") >= 20),
        "vec_id", "embedding", m = 2, k = 8, iters = 0))
    val out = Similarity.knnIvfPq(
      e.filter(col("vec_id") >= 20),
      e.filter(col("vec_id") >= 10 && col("vec_id") < 20),
      "vec_id", "embedding", ctr, "vec_id", "embedding",
      cbs, k = 3, nprobe = 2)
    time("knnIvfPq pass1")(out.count())
    time("knnIvfPq pass2")(out.count())
    val sd = Similarity.semanticDedup(e, "vec_id", "embedding",
      ctr, "vec_id", "embedding", threshold = 0.35)
    sd.explain("formatted")
    time("semanticDedup pass1")(sd.count())
    // micro: raw within-cell pair scan, no operator machinery
    val asn = Similarity.semanticDedup(e, "vec_id", "embedding",
        ctr, "vec_id", "embedding", threshold = 2.0)
      .join(e.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")), "id")
      .repartition(32)
      .persist()
    time("assignment")(asn.count())
    val pairs = asn.as("a").join(asn.as("b"),
      col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
    time("raw pair count")(System.err.println("pairs=" + pairs.count()))
    val scored = pairs.filter(
      Similarity.cosine(col("a.v"), col("b.v")) >= 0.35)
    time("scored pair count")(System.err.println("hits=" + scored.count()))
    time("scored pass2")(scored.count())
    spark.stop()
  }
}
