package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (mandated extension X3,
  * SURVEY.md §2.4). Embeddings are ArrayType(FloatType); all math is done in
  * double via codegen'd higher-order functions (zip_with + aggregate), no
  * UDFs.
  *
  * Determinism note: `aggregate` folds left-to-right, so dot products are
  * bit-reproducible — and bit-identical to any engine that sums a double
  * accumulator sequentially (verified against DuckDB's list_dot_product).
  *
  * Scale posture: the query side of a kNN search must be the small side and
  * is broadcast; the corpus is never shuffled for brute force. The LSH
  * variant buckets the corpus by hyperplane signs so a 100 TB corpus only
  * pair-joins within buckets.
  */
object Similarity {

  /** Sequential-fold dot product — native codegen expression. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.vecDot(a, b)

  /** Cosine similarity; formula fixed as dot/sqrt(na*nb) for cross-engine
    * reproducibility. Native codegen expression (single pass).
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.vecCosine(a, b)

  /** Higher-order-function formulations — semantically identical to the
    * native expressions above (same sequential fold); kept as the
    * cross-check reference implementation.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / sqrt(dotHof(a, a) * dotHof(b, b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: every query row against every corpus row,
    * query side broadcast (must be small), top-k per query via window rank —
    * Catalyst turns the per-partition sort + filter into an efficient
    * partial top-k. Output: (qid, rank, nid, sim).
    */
  def knnBruteForce(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("qid"), asDouble(col(vecCol)).as("qv")))
    // Spread the corpus: the per-pair dot products are interpreted HOF
    // evals, and a single-file corpus would otherwise score serially.
    val c = corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("nid"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(q)
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "sim")
  }

  /** Random-hyperplane LSH bucket id: one sign bit per plane, concatenated
    * in plane order. Planes are a small DataFrame (pid, vec) — broadcast.
    * Output: input columns + `bucket` string.
    */
  def hyperplaneBuckets(
      df: DataFrame, idCol: String, vecCol: String,
      planes: DataFrame, planeId: String, planeVec: String): DataFrame = {
    val p = broadcast(planes.select(
      col(planeId).as("__pid"), asDouble(col(planeVec)).as("__pv")))
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .crossJoin(p)
      .withColumn("__bit", when(dot(col("__v"), col("__pv")) >= 0, "1").otherwise("0"))
      .groupBy(idCol)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pid"), col("__bit")))),
          s => s.getField("__bit")), "").as("bucket"))
  }

  /** Embedding-cosine near-duplicate pairs, LSH-blocked: only pairs falling
    * in the same hyperplane bucket are compared (the blocking that makes
    * all-pairs dedup feasible at corpus scale — pair space is per-bucket,
    * never global). Output: (da, db, cos) with da < db, cos >= threshold.
    */
  def cosineDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      planes: DataFrame, planeId: String, planeVec: String,
      threshold: Double): DataFrame = {
    val b = hyperplaneBuckets(df, idCol, vecCol, planes, planeId, planeVec)
      .join(df.select(col(idCol), asDouble(col(vecCol)).as("__v")), idCol)
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .withColumn("cos", cosine(col("x.__v"), col("y.__v")))
      .filter(col("cos") >= threshold)
      .select(col(s"x.$idCol").as("da"), col(s"y.$idCol").as("db"), col("cos"))
  }

  /** Bucketed ANN: top-k per query among corpus vectors in the *same* LSH
    * bucket. Recall < 1 by construction; the scale path for corpora where
    * brute force is impossible. Shuffles on bucket, never cross-joins the
    * full corpus.
    */
  def knnLsh(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      planes: DataFrame, planeId: String, planeVec: String, k: Int): DataFrame = {
    val cb = hyperplaneBuckets(corpus, idCol, vecCol, planes, planeId, planeVec)
      .withColumnRenamed(idCol, "nid")
      .join(corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("cv")), "nid")
    val qb = hyperplaneBuckets(queries, idCol, vecCol, planes, planeId, planeVec)
      .withColumnRenamed(idCol, "qid")
      .join(queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv")), "qid")
    val scored = cb.join(broadcast(qb), "bucket")
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "sim", "bucket")
  }
}
