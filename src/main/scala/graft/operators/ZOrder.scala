package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping. Sorting a
  * table by the bit-interleaved z-value of two key columns bounds BOTH
  * keys' min/max range inside every output file, so parquet footer stats
  * prune scans filtered on either key — the lakehouse trick behind
  * Delta/Iceberg `ZORDER BY`, expressed here as plain codegen'd bit
  * arithmetic (no UDF, no shuffle beyond the range sort the caller picks).
  */
object ZOrder {

  /** Bit-interleaved z-value of two non-negative ints: bit `b` of `x`
    * lands at position `2b`, bit `b` of `y` at `2b+1`. Callers bound the
    * domain first (e.g. `col % 1024` or a rank) so `bits` covers it.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }

  /** Range-partition `df` by the z-value of (`xCol` % 2^bits, `yCol` %
    * 2^bits) into `files` output slices — the write-side layout step.
    * Range exchange samples the z distribution, so slices are balanced
    * even when the key space is skewed.
    */
  def cluster(df: DataFrame, xCol: String, yCol: String,
              bits: Int, files: Int): DataFrame = {
    val m = 1L << bits
    df.withColumn("__z", zValue(col(xCol) % m, col(yCol) % m, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
