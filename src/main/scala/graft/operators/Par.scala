package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism hygiene for narrow CPU-heavy stages. */
object Par {

  /** Spread `df` across the cluster ONLY when it arrives under-partitioned
    * (fewer partitions than cores). Locally the corpus tables are single
    * parquet files — one input split — so every narrow stage (tokenize,
    * shingle, HOF folds) would run on a single task without this. At 100 TB
    * the same input is hundreds of thousands of splits and a repartition
    * here would be a pointless full-corpus shuffle — so it must be
    * conditional on the *actual* input partitioning, not unconditional.
    *
    * (`df.rdd.getNumPartitions` plans the physical scan to count splits but
    * runs no job.)
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}
