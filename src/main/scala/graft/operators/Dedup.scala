package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators (mandated extension X1/X2, SURVEY.md §2.4).
  *
  * Scale posture (100 TB): every method is expressed as shuffle-parallel
  * groupBy/join plans — no driver collect, no cross join. Near-dup candidate
  * generation is always *blocked* (LSH bands or shared-shingle inverted
  * index) so the pair space stays ~linear in input, never n².
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `orderCol` per key group.
    * One shuffle on the key columns; map-side partial aggregation applies.
    * (Spark's dropDuplicates keeps an arbitrary row; this variant is
    * deterministic, which the oracle gate requires.)
    */
  def exactKeepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct (docId, shingle) pairs for an n-word shingling of `textCol`.
    *
    * The input is spread across the cluster first: corpus tables often
    * arrive as few large-ish files (or one small one), and the tokenize +
    * shingle + explode work is per-row CPU (higher-order functions evaluate
    * interpreted — they are CodegenFallback) — without the repartition the
    * whole explode runs at *file* parallelism, which can mean one task.
    */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol),
        explode(org.apache.spark.sql.graft.WordShingles.of(col(textCol), n))
          .as("shingle"))
      .distinct()

  /** All-pairs n-gram Jaccard >= threshold, via a shared-shingle inverted
    * index: a pair is only materialized if it shares at least one shingle
    * (complete for any threshold > 0). `maxDocFreq` drops shingles appearing
    * in more than that many docs — the standard prefix-frequency cut that
    * keeps the inverted index from exploding on boilerplate shingles at
    * scale (0 = keep all, exact semantics for the oracle).
    *
    * Output: (da, db, jacc) with da < db.
    */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDocFreq: Long = 0L): DataFrame = {
    val sh0 = shingleSet(df, idCol, textCol, n)
    // The shingle set feeds three plan branches (per-doc counts + both join
    // sides); without materialization Spark re-explodes the corpus per
    // branch. MEMORY_AND_DISK: at scale this is the "materialize the
    // inverted index" step and may spill, which is fine.
    val shGive =
      if (maxDocFreq <= 0) sh0
      else {
        val rare = sh0.groupBy("shingle").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDocFreq).select("shingle")
        sh0.join(rare, "shingle")
      }
    val sh = shGive.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnt = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val inter = sharedShingleIntersections(sh, idCol)
    inter
      .join(cnt.select(col(idCol).as("da"), col("n_sh").as("na")), "da")
      .join(cnt.select(col(idCol).as("db"), col("n_sh").as("nb")), "db")
      .withColumn("jacc",
        col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double"))
      .filter(col("jacc") >= threshold)
      .select("da", "db", "jacc")
  }

  /** Pair intersection counts via the inverted-index self-join. The join
    * *output* is orders of magnitude larger than its input (freq² pairs per
    * shingle), so input-size-driven planning gets it badly wrong: AQE would
    * happily broadcast the (small) input and/or coalesce the join down to a
    * couple of tasks, serializing a multi-million-row explosion. Pin the
    * plan instead: hash-repartition both sides on the key at full
    * parallelism and force a shuffle merge join.
    */
  private def sharedShingleIntersections(sh: DataFrame, idCol: String): DataFrame = {
    val p = sh.sparkSession.sparkContext.defaultParallelism
    val byShingle = sh.repartition(p, col("shingle"))
    byShingle.as("a").hint("shuffle_merge")
      .join(byShingle.as("b").hint("shuffle_merge"),
        col("a.shingle") === col("b.shingle") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
      .agg(count(lit(1)).as("ni"))
  }

  /** MinHash signature column j for a shingle: portable variant hashes with
    * md5 (string min — reproducible in any engine), fast variant with
    * xxhash64 (codegen'd long min — what a production cluster should run).
    */
  private def minhashOf(shingle: Column, seed: Int, portable: Boolean): Column =
    if (portable) md5(concat(lit(s"$seed|"), shingle))
    else xxhash64(lit(seed), shingle)

  /** MinHash + LSH banding near-dup pairs, verified with exact Jaccard.
    *
    * Plan shape: shingle explode → k min-hash aggregations (one shuffle on
    * docId) → band hashes → groupBy(band) self-join for candidates (shuffle
    * on band hash, pair space bounded by band collisions) → exact Jaccard
    * verify on the candidate set only. AQE handles band-bucket skew.
    *
    * Tuning: the s-curve midpoint is (1/bands)^(bands/k); rows-per-band
    * r = k/bands controls how hard low-similarity pairs are suppressed. On
    * corpora with high *background* similarity (shared boilerplate/vocab),
    * r must be >= 4 or the candidate set grows quadratically — r=2 at a
    * background Jaccard of 0.2 admits 4% of ALL pairs per band.
    *
    * @param k        signature length (hash functions)
    * @param bands    number of LSH bands; rows per band = k / bands
    * @param portable md5-based hashing (engine-portable, oracle-checkable)
    *                 instead of xxhash64
    */
  def minHashLsh(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, threshold: Double,
      portable: Boolean = false, materialize: Boolean = true): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    // Feeds signature aggregation AND the verify joins — materialize once.
    val sh0 = shingleSet(df, idCol, textCol, n)
    val sh = if (materialize)
      sh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else sh0
    val sigCols = (0 until k).map(j =>
      min(minhashOf(col("shingle"), j, portable)).as(s"m$j"))
    val sig = sh.groupBy(idCol).agg(sigCols.head, sigCols.tail: _*)
    val bandDf = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(j => col(s"m$j").cast("string"))
      sig.select(col(idCol), lit(b).as("band"),
        md5(concat_ws("|", cols: _*)).as("bh"))
    }.reduce(_ unionAll _)
    val bandMat = if (materialize)
      // both sides of the candidate self-join — without this the signature
      // aggregation re-runs once per union branch per side
      bandDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else bandDf
    val cand = bandMat.as("x")
      .join(bandMat.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("da"), col(s"y.$idCol").as("db"))
      .distinct()
    // Exact verify, restricted to candidate docs then candidate pairs.
    val docs = cand.select(col("da").as(idCol))
      .union(cand.select(col("db"))).distinct()
    val shc = sh.join(docs, idCol)
    val cnt = shc.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val inter = sharedShingleIntersections(shc, idCol)
    cand.join(inter, Seq("da", "db"))
      .join(cnt.select(col(idCol).as("da"), col("n_sh").as("na")), "da")
      .join(cnt.select(col(idCol).as("db"), col("n_sh").as("nb")), "db")
      .withColumn("jacc",
        col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double"))
      .filter(col("jacc") >= threshold)
      .select("da", "db", "jacc")
  }

  /** SimHash bucketing: docs sharing a 16-bit SimHash are near-dup
    * candidates. Returns (docId, simhash). One shuffle-free projection —
    * bucket-join downstream as needed.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol),
        TextOps.simhashBits(array_distinct(TextOps.tokens(col(textCol))))
          .as("simhash"))
}
