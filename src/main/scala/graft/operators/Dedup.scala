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

  /** Distinct (docId, shingle) pairs for an n-word shingling of `textCol`. */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol),
        explode(TextOps.shingles(TextOps.tokens(col(textCol)), n)).as("shingle"))
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
    val sh =
      if (maxDocFreq <= 0) sh0
      else {
        val rare = sh0.groupBy("shingle").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDocFreq).select("shingle")
        sh0.join(rare, "shingle")
      }
    val cnt = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col(s"a.shingle") === col(s"b.shingle") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
      .agg(count(lit(1)).as("ni"))
    inter
      .join(cnt.select(col(idCol).as("da"), col("n_sh").as("na")), "da")
      .join(cnt.select(col(idCol).as("db"), col("n_sh").as("nb")), "db")
      .withColumn("jacc",
        col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double"))
      .filter(col("jacc") >= threshold)
      .select("da", "db", "jacc")
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
    * @param k        signature length (hash functions)
    * @param bands    number of LSH bands; rows per band = k / bands
    * @param portable md5-based hashing (engine-portable, oracle-checkable)
    *                 instead of xxhash64
    */
  def minHashLsh(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, threshold: Double,
      portable: Boolean = false): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sh = shingleSet(df, idCol, textCol, n)
    val sigCols = (0 until k).map(j =>
      min(minhashOf(col("shingle"), j, portable)).as(s"m$j"))
    val sig = sh.groupBy(idCol).agg(sigCols.head, sigCols.tail: _*)
    val bandDf = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(j => col(s"m$j").cast("string"))
      sig.select(col(idCol), lit(b).as("band"),
        md5(concat_ws("|", cols: _*)).as("bh"))
    }.reduce(_ unionAll _)
    val cand = bandDf.as("x")
      .join(bandDf.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("da"), col(s"y.$idCol").as("db"))
      .distinct()
    // Exact verify, restricted to candidate docs then candidate pairs.
    val docs = cand.select(col("da").as(idCol))
      .union(cand.select(col("db"))).distinct()
    val shc = sh.join(docs, idCol)
    val cnt = shc.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val inter = shc.as("a")
      .join(shc.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
      .agg(count(lit(1)).as("ni"))
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
    df.select(col(idCol),
      TextOps.simhashBits(array_distinct(TextOps.tokens(col(textCol))))
        .as("simhash"))
}
