package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(sf("embeddings"))

  test("cosine: self-similarity is 1, orthogonal is 0, symmetric") {
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0)),
      (Array(1.0, 0.0), Array(0.0, 2.0)),
      (Array(1.0, 2.0), Array(3.0, 4.0)),
      (Array(3.0, 4.0), Array(1.0, 2.0))).toDF("a", "b")
    val sims = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(math.abs(sims(1)) < 1e-12)
    assert(sims(2) == sims(3), "cosine is symmetric")
  }

  test("knnBruteForce returns exactly k ranked neighbors per query") {
    val out = Similarity.knnBruteForce(
      emb.filter($"vec_id" >= 10), emb.filter($"vec_id" < 5),
      "vec_id", "embedding", k = 7)
    val byQ = out.groupBy("qid").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .as[(Long, Long, Int)].collect()
    assert(byQ.length == 5)
    assert(byQ.forall { case (_, n, mx) => n == 7 && mx == 7 })
    // rank 1 must hold the max similarity
    val r = out.withColumn("mx", max("sim").over(
      org.apache.spark.sql.expressions.Window.partitionBy("qid")))
      .filter($"rank" === 1)
    assert(r.filter($"sim" =!= $"mx").count() == 0)
  }

  test("hyperplaneBuckets: bucket is one bit per plane, partitioning all rows") {
    val planes = emb.filter($"vec_id" < 3)
    val b = Similarity.hyperplaneBuckets(emb, "vec_id", "embedding",
      planes, "vec_id", "embedding")
    assert(b.count() == emb.count())
    val buckets = b.select("bucket").distinct().as[String].collect()
    assert(buckets.forall(s => s.length == 3 && s.forall("01".contains(_))))
  }

  test("knnLsh only pairs within a shared bucket and never exceeds k") {
    val planes = emb.filter($"vec_id" < 2)
    val out = Similarity.knnLsh(
      emb.filter($"vec_id" >= 10), emb.filter($"vec_id" < 5),
      "vec_id", "embedding", planes, "vec_id", "embedding", k = 3)
    val perQ = out.groupBy("qid").agg(count(lit(1)).as("n")).as[(Long, Long)].collect()
    assert(perQ.forall(_._2 <= 3))
  }
}
