package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKAgg

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("struct top-k equals the window row_number form on random data") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500)(i =>
      (rnd.nextInt(5), rnd.nextInt(40).toLong, i.toLong))
    val df = rows.toDF("g", "x", "id").repartition(7)
    val got = df
      .groupBy("g")
      .agg(TopKAgg.of(struct(col("x"), col("id")), 4).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("p", "v")))
      .select(col("g"), (col("p") + 1).as("rnk"), col("v.x"), col("v.id"))
      .as[(Int, Int, Long, Long)].collect().toSet
    val w = Window.partitionBy("g").orderBy("x", "id")
    val want = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 4)
      .select(col("g"), col("rnk"), col("x"), col("id"))
      .as[(Int, Int, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("partial buffers merge across partitions; fewer than k rows kept whole") {
    val df = Seq((1, 10L), (1, 3L), (2, 99L)).toDF("g", "x").repartition(3)
    val got = df.groupBy("g").agg(TopKAgg.of(col("x"), 5).as("top"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1) == Seq(3L, 10L) && got(2) == Seq(99L))
  }

  test("SQL surface: top_k_agg over strings, negated-long descending order") {
    Seq(("a", 1L), ("a", 5L), ("a", 3L), ("b", 2L)).toDF("g", "x")
      .createOrReplaceTempView("tk")
    // smallest (-x) first = descending x
    val out = spark.sql(
        "SELECT g, transform(top_k_agg(-x, 2), v -> -v) AS top FROM tk GROUP BY g")
      .as[(String, Seq[Long])].collect().toMap
    assert(out("a") == Seq(5L, 3L) && out("b") == Seq(2L))
    spark.catalog.dropTempView("tk")
  }
}
