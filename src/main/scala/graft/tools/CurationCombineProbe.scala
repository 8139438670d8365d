package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Interleaved A/B for VERDICT r14 #3: x6_curation3's per-stage counting
  * as eight lang-keyed aggregates left-joined back together (SHIPPED —
  * the separate count branches share exchanges via ReuseExchange) vs ONE
  * aggregation over a stage-tagged union (the rewrite VERDICT r14 #3
  * hypothesized; REJECTED in r15 — isolated bench children at matched
  * calm calibrations measured it 22.20 s vs 9.58 s, stage count 48 → 92:
  * the union's multi-distinct Expand defeats the exchange reuse, so each
  * branch recomputes its chain prefix). Both arms rebuild the identical
  * curation chain through the same operators; only the combine differs.
  * Output equality is asserted before timing.
  *
  * Usage: runMain graft.tools.CurationCombineProbe [reps]
  */
object CurationCombineProbe {

  private val enStop = Seq("the", "a", "of", "and", "to", "is")

  /** The x6_curation3 chain, verbatim from the gate body: returns the
    * stage tables the combine consumes.
    */
  private def chain(s: SparkSession, dir: String):
      (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame,
       DataFrame, DataFrame) = {
    val docs = graft.model.Tables.load(s, dir, "documents")
    val emb = graft.model.Tables.load(s, dir, "embeddings")
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val raw = docs.filter(col("doc_id") % 17 =!= 0)
    val st = TextOps.stripBoilerplate(raw, "doc_id", "text",
        segWords = 8, minDf = 2, scopeCols = Seq("source"))
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("text_kept").as("ctext"))
      .join(raw.select("doc_id", "lang"), "doc_id")
    val score = TextOps.linearQualityScore(col("ctext"), bias = -2.0,
      wTtr = 3.0, wStop = 5.0, wAvgLen = 0.25, stopwords = enStop)
    val q = st.filter(score >= 0.7)
      .withColumn("n_tok", size(TextOps.tokens(col("ctext"))).cast("long"))
    val ex = Dedup.exactKeepFirst(q.withColumn("__h", md5(col("ctext"))),
        Seq("__h"), "doc_id").drop("__h")
    val pairs = Dedup.jaccardPairs(ex, "doc_id", "ctext",
      n = 3, threshold = 0.8)
    val labels = Dedup.resolveClusters(ex, "doc_id", pairs)
    val near = Dedup.dedupByClustersBest(ex, "doc_id", "n_tok", labels)
    val svEmb = emb.join(near.select(col("doc_id").as("vec_id")), "vec_id")
    val semKeep = Similarity.semanticDedup(svEmb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 8), "vec_id", "embedding",
      threshold = 0.35)
    val semDropped = svEmb.select(col("vec_id").as("doc_id"))
      .join(semKeep.select(col("id").as("doc_id")), Seq("doc_id"),
        "left_anti")
    val afterSem = near.join(semDropped, Seq("doc_id"), "left_anti")
    val contam = Dedup.contamination(
        afterSem.select(col("doc_id"), col("ctext").as("text")), bench,
        "doc_id", "text", n = 3)
      .filter(col("frac") >= 0.5).select("doc_id")
    val clean = afterSem.join(contam, Seq("doc_id"), "left_anti")
    val fin = Sample.tokenBudget(clean, "lang", "doc_id", "n_tok",
      Map("en" -> 2000L), default = 800L)
    val packed = Multimodal.shardAssign(fin, "doc_id", col("n_tok"),
        "lang", 256L)
      .withColumnRenamed("shard", "pack").drop("n_bytes")
    val sharded = Multimodal.shardAssign(packed, "doc_id",
        length(col("ctext")).cast("long"), "lang", 4096L)
      .withColumnRenamed("shard", "byte_shard")
    val split = sharded
      .join(labels.withColumnRenamed("id", "doc_id")
        .select("doc_id", "cluster"), "doc_id")
      .withColumn("split", Sample.hashSplit("cluster",
        Seq("e6" -> "train", "f3" -> "val"), "test"))
    (docs, st, q, ex, near, afterSem, clean, split)
  }

  private def unionCombine(docs: DataFrame, st: DataFrame, q: DataFrame,
                           ex: DataFrame, near: DataFrame,
                           afterSem: DataFrame, clean: DataFrame,
                           split: DataFrame): DataFrame = {
    def tag(df: DataFrame, st: Int): DataFrame =
      df.select(col("lang"), lit(st).as("__st"),
        lit(null).cast("long").as("__n_tok"),
        lit(null).cast("long").as("__pack"),
        lit(null).cast("long").as("__byte_shard"),
        lit(null).cast("string").as("__split"))
    val tagged = tag(docs, 0)
      .unionByName(tag(st, 1))
      .unionByName(tag(q, 2))
      .unionByName(tag(ex, 3))
      .unionByName(tag(near, 4))
      .unionByName(tag(afterSem, 5))
      .unionByName(tag(clean, 6))
      .unionByName(split.select(col("lang"), lit(7).as("__st"),
        col("n_tok").as("__n_tok"), col("pack").as("__pack"),
        col("byte_shard").as("__byte_shard"),
        col("split").as("__split")))
    def n(st: Int) = sum(when(col("__st") === st, 1L).otherwise(0L))
    tagged.groupBy("lang").agg(
        n(0).as("n_raw"), n(1).as("n_strip"), n(2).as("n_quality"),
        n(3).as("n_exact"), n(4).as("n_near"), n(5).as("n_sem"),
        n(6).as("n_clean"), n(7).as("n_budget"),
        coalesce(sum(when(col("__st") === 7, col("__n_tok"))), lit(0L))
          .as("sum_tok"),
        countDistinct(when(col("__st") === 7, col("__pack")))
          .as("n_packs"),
        countDistinct(when(col("__st") === 7, col("__byte_shard")))
          .as("n_shards"),
        sum(when(col("__st") === 7 && col("__split") === "train", 1L)
          .otherwise(0L)).as("n_train"),
        sum(when(col("__st") === 7 && col("__split") === "val", 1L)
          .otherwise(0L)).as("n_val"),
        sum(when(col("__st") === 7 && col("__split") === "test", 1L)
          .otherwise(0L)).as("n_test"))
      .orderBy("lang")
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(app = "graft-curation-combine-probe")
    def oldArm(): DataFrame = {
      val (docs, st, q, ex, near, afterSem, clean, split) = chain(spark, dir)
      unionCombine(docs, st, q, ex, near, afterSem, clean, split)
    }
    // Control arm IS the shipped gate (8-aggregate combine).
    def newArm(): DataFrame =
      graft.SparkEntry.queries("x6_curation3")(spark, dir)
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def run(d: => DataFrame): Double = {
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      scrub(); dt
    }
    val a = oldArm().collect().map(_.toSeq).toSet; scrub()
    val b = newArm().collect().map(_.toSeq).toSet; scrub()
    require(a == b, s"arms disagree:\nold=$a\nnew=$b")
    run(oldArm()); run(newArm()) // warmup
    val os = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ns = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) { os += run(oldArm()); ns += run(newArm()) }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(",")
    System.err.println(s"[curation-combine] rows=${a.size} " +
      s"union=[${fmt(os.toSeq)}] shipped=[${fmt(ns.toSeq)}]")
    spark.stop()
  }
}
