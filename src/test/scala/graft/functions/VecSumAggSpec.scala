package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecSumAgg

class VecSumAggSpec extends SparkSpec {
  import spark.implicits._

  test("elementwise sums, null rows skipped, empty group is zeros") {
    val df = Seq(
      Some(Seq(1L, 2L, 3L)),
      None,
      Some(Seq(10L, 20L, 30L))).toDF("v")
    val out = df.select(VecSumAgg.of(col("v"), 3)).as[Seq[Long]].head()
    assert(out == Seq(11L, 22L, 33L))
    val empty = df.filter(lit(false))
      .select(VecSumAgg.of(col("v"), 3)).as[Seq[Long]].head()
    assert(empty == Seq(0L, 0L, 0L))
  }

  test("bit-identical under repartitioning; matches posexplode+groupBy") {
    val rows = (1 to 500).map(i => Seq(i.toLong, (i * i).toLong, -i * 3L))
    val df = rows.toDF("v")
    val a = df.select(VecSumAgg.of(col("v"), 3)).as[Seq[Long]].head()
    val b = df.repartition(13)
      .select(VecSumAgg.of(col("v"), 3)).as[Seq[Long]].head()
    assert(a == b)
    val ref = df.select(posexplode(col("v")))
      .groupBy("pos").agg(sum("col").as("s"))
      .orderBy("pos").as[(Int, Long)].collect().map(_._2).toSeq
    assert(a == ref)
  }

  test("registered on the SQL surface via GraftExtensions") {
    Seq(Seq(1L, 2L), Seq(3L, 4L)).toDF("v").createOrReplaceTempView("vs")
    val out = spark.sql("SELECT vec_sum_agg(v, 2) AS s FROM vs")
      .as[Seq[Long]].head()
    assert(out == Seq(4L, 6L))
    spark.catalog.dropTempView("vs")
  }

  test("grouped: one buffer per group") {
    val df = Seq(("g1", Seq(1L, 1L)), ("g2", Seq(5L, 7L)),
      ("g1", Seq(2L, 3L))).toDF("g", "v")
    val out = df.groupBy("g").agg(VecSumAgg.of(col("v"), 2).as("s"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out == Map("g1" -> Seq(3L, 4L), "g2" -> Seq(5L, 7L)))
  }
}
