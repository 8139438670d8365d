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

  /** Per-row salt in [0, factor): derived from the row's physical position
    * (monotonically_increasing_id), NOT its content — exact duplicate rows
    * of a hot key land on *different* salts, which is the whole point (a
    * content hash would send every copy of the hottest row to one salt).
    * Works for any column types, including unhashable ones (maps).
    */
  private def saltOf(factor: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(factor))

  /** Skew-safe equi-join: big side salted, small side replicated factor×.
    * Semantically identical to `big.join(small, keys)` for any inner join.
    * The salt column name is uniquified against the inputs' columns.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int): DataFrame = {
    val spark = big.sparkSession
    import spark.implicits._
    val saltCol = Iterator.from(0).map(i => s"__salt$i")
      .find(n => !big.columns.contains(n) && !small.columns.contains(n)).get
    val salted = big.withColumn(saltCol, saltOf(factor))
    val replicated = small.crossJoin(
      (0 until factor).toDF(saltCol).hint("broadcast"))
    salted.join(replicated, keys :+ saltCol).drop(saltCol)
  }
}
