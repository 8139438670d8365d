package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Co-location and skew tools for cluster-scale joins (SURVEY.md §2.4
  * 100 TB notes; the reference configures join behavior but never joins —
  * k8s/submit/etl-on-gcp-vinicius-campos.py:85).
  *
  *  - Bucketing: persist both join sides hash-bucketed (and sorted) on the
  *    join key → repeated joins are exchange-free sort-merge joins. On a
  *    100 TB fact table this removes the dominant shuffle from every
  *    downstream join on that key.
  *  - Salting: when one join key is pathologically hot, spread the big
  *    side's hot rows over `factor` sub-keys and replicate the small side's
  *    matching rows — bounded skew at the cost of factor× on the small side.
  */
object Colocate {

  /** Write a table bucketed+sorted by the join key into the warehouse
    * catalog. Readers joining two tables bucketed the same way on the same
    * key get a shuffle-free (and sort-free) merge join.
    */
  def writeBucketed(df: DataFrame, db: String, table: String,
                    bucketCols: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    graft.io.Writers.dropManaged(spark, db, table)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(s"$db.$table")
  }

  /** Deterministic salt in [0, factor): row-dependent but stable for a given
    * row content (xxhash64 of all columns). Hot keys fan out across `factor`
    * sub-partitions because their *rows* differ even when the key doesn't.
    */
  private def saltOf(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(factor))

  /** Skew-safe equi-join: big side salted, small side replicated factor×.
    * Semantically identical to `big.join(small, keys)` for any inner join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int): DataFrame = {
    val spark = big.sparkSession
    import spark.implicits._
    val salted = big.withColumn("__salt", saltOf(big, factor))
    val replicated = small.crossJoin(
      (0 until factor).toDF("__salt").hint("broadcast"))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
