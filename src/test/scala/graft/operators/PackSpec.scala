package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: budget-chunked, offsets correct, spanning doc keeps start pack") {
    // one shard; hash order is fixed but opaque — verify invariants instead
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val out = Pack.packSequences(docs, "doc_id", "n_tokens", "lang", 256L)
    // every doc's start offset is inside the budget
    assert(out.filter(col("pack_off") >= 256 || col("pack_off") < 0).count() == 0)
    // pack ids are dense from 0 per shard
    val ids = out.groupBy("lang")
      .agg(min("pack_id").as("mn"), max("pack_id").as("mx"),
        countDistinct("pack_id").as("nd"))
      .as[(String, Long, Long, Long)].collect()
    ids.foreach { case (lang, mn, mx, nd) =>
      assert(mn == 0 && nd == mx + 1, s"$lang packs not dense") }
    // token conservation
    assert(out.agg(sum("n_tokens")).as[Long].head() ==
      docs.agg(sum("n_tokens")).as[Long].head())
  }

  test("packSequences is partition-invariant") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    def packs(df: org.apache.spark.sql.DataFrame) =
      Pack.packSequences(df, "doc_id", "n_tokens", "lang", 256L)
        .select("doc_id", "pack_id", "pack_off")
        .as[(Long, Long, Long)].collect().toSet
    assert(packs(docs.repartition(1)) == packs(docs.repartition(17)))
  }

  test("mixture: per-stratum quotas, default for the rest, deterministic") {
    val docs = spark.read.parquet(sf("documents"))
    val out = Sample.mixture(docs, "lang", "doc_id",
      Map("en" -> 5, "zh" -> 3), default = 2)
    val per = out.groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    sizes.foreach { case (lang, sz) =>
      val q = lang match { case "en" => 5L; case "zh" => 3L; case _ => 2L }
      assert(per(lang) == math.min(q, sz), s"$lang quota") }
    val again = Sample.mixture(docs.repartition(9), "lang", "doc_id",
      Map("en" -> 5, "zh" -> 3), default = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }
}
