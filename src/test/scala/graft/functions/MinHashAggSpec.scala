package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.graft.MinHashAgg
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")

  /** Reference computation of the signature on the driver. */
  private def expected(ws: Seq[String], k: Int): Seq[Long] =
    (0 until k).map { j =>
      ws.map { w =>
        val base = XxHash64Function.hash(UTF8String.fromString(w), StringType, 42L)
        MinHashAgg.mix(base + j * MinHashAgg.Gamma)
      }.min
    }

  test("signature matches the driver-side reference fold") {
    val df = words.map(w => ("d", w)).toDF("id", "w")
    val sig = df.groupBy("id").agg(MinHashAgg.of(col("w"), 8).as("sig"))
      .select("sig").as[Seq[Long]].head()
    assert(sig == expected(words, 8))
  }

  test("signature is invariant to partitioning (merge path)") {
    val many = (1 to 2000).map(i => (i % 7L, s"tok$i"))
    val one = many.toDF("id", "w").repartition(1)
    val wide = many.toDF("id", "w").repartition(13)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("id").agg(MinHashAgg.of(col("w"), 16).as("sig"))
        .orderBy("id").as[(Long, Seq[Long])].collect().toSeq
    assert(sigs(one) == sigs(wide))
  }

  test("plan carries ONE aggregate expression regardless of k") {
    val df = words.map(w => ("d", w)).toDF("id", "w")
    val agg = df.groupBy("id").agg(MinHashAgg.of(col("w"), 128).as("sig"))
    val plan = agg.queryExecution.optimizedPlan.toString
    assert("minhash_agg".r.findAllIn(plan).size == 1)
  }

  test("minhash_agg and word_shingles are callable from SQL via GraftExtensions") {
    words.map(w => ("d", w)).toDF("id", "w").createOrReplaceTempView("mh_sql")
    val sig = spark.sql(
      "SELECT minhash_agg(w, 8) AS sig FROM mh_sql GROUP BY id")
      .select("sig").as[Seq[Long]].head()
    assert(sig == expected(words, 8))
    val sh = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS s")
      .select("s").as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    spark.catalog.dropTempView("mh_sql")
  }

  test("nulls are ignored; empty slots are Long.MaxValue sentinels") {
    val df = Seq(("d", Option("x")), ("d", None)).toDF("id", "w")
    val sig = df.groupBy("id").agg(MinHashAgg.of(col("w"), 4).as("sig"))
      .select("sig").as[Seq[Long]].head()
    assert(sig == expected(Seq("x"), 4))
  }
}
