package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(sf("embeddings"))

  test("native vecDot/vecCosine are bit-identical to the HOF reference fold") {
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter($"a.vec_id" < 20 && $"b.vec_id".between(20, 60))
      .select(
        $"a.embedding".cast("array<double>").as("x"),
        $"b.embedding".cast("array<double>").as("y"))
    val cmp = pairs.select(
      Similarity.dot($"x", $"y").as("d_native"),
      Similarity.dotHof($"x", $"y").as("d_hof"),
      Similarity.cosine($"x", $"y").as("c_native"),
      Similarity.cosineHof($"x", $"y").as("c_hof"))
    val rows = cmp.as[(Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (dn, dh, cn, ch) =>
      assert(java.lang.Double.doubleToLongBits(dn) ==
        java.lang.Double.doubleToLongBits(dh), s"dot mismatch $dn vs $dh")
      assert(java.lang.Double.doubleToLongBits(cn) ==
        java.lang.Double.doubleToLongBits(ch), s"cosine mismatch $cn vs $ch")
    }
  }

  test("implicit cast accepts float arrays directly") {
    val r = emb.limit(5)
      .select(Similarity.cosine($"embedding", $"embedding").as("c"))
      .as[Double].collect()
    assert(r.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("vec_dot / vec_cosine are callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
      "vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("null array yields null, not an exception") {
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(Similarity.dot($"a", $"b")).collect()
    assert(r.head.isNullAt(0))
  }
}
