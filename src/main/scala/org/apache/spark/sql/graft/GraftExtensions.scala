package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions installer: exposes the engine's native
  * expressions to the SQL surface (`SELECT vec_cosine(a, b) ...`,
  * `word_shingles(text, 3)`, `minhash_agg(shingle, 16)`), so the custom
  * functions are first-class for spark.sql users, not just the Column API.
  * Wire with `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Plan-level rewrite: natural BETWEEN range joins -> bucketized
    // equijoins (see RangeJoinRewrite; off until
    // spark.graft.rangeJoin.bucket is set).
    ext.injectOptimizerRule(RangeJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_dot takes exactly 2 arguments")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_cosine takes exactly 2 arguments")
        CosineSimilarity(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_sub"),
      new ExpressionInfo(classOf[VecSub].getName, "vec_sub"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_sub takes exactly 2 arguments")
        VecSub(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("text_clean"),
      new ExpressionInfo(classOf[TextClean].getName, "text_clean"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "text_clean takes exactly 1 argument")
        TextClean(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "word_shingles(text, n)")
        WordShingles(children(0), intLit(children(1), "shingle width n"))
      }))
    // Aggregate functions resolve like any other: the analyzer wraps a
    // returned AggregateFunction in an AggregateExpression.
    ext.injectFunction((
      FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_agg(input, k)")
        MinHashAgg(children(0), intLit(children(1), "signature length k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("top_k_agg"),
      new ExpressionInfo(classOf[TopKAgg].getName, "top_k_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "top_k_agg(orderable, k)")
        TopKAgg(children(0), intLit(children(1), "shortlist size k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_sum_agg"),
      new ExpressionInfo(classOf[VecSumAgg].getName, "vec_sum_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_sum_agg(long_array, n)")
        VecSumAgg(children(0), intLit(children(1), "vector length n"))
      }))
    // Spark's internal Bloom-filter pair (the runtime-filter machinery),
    // exposed for sketch-based membership at the SQL surface. The caller
    // hashes values to long (xxhash64) on both build and probe sides.
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "bloom_agg(hashed_long, est_items, num_bits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "bloom_might_contain(bloom, hashed_long)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))
      }))
  }
}
