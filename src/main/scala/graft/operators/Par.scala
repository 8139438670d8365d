package graft.operators

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, RepartitionOperation, Sort, Window}

/** Parallelism hygiene for narrow CPU-heavy stages. */
object Par {

  /** Spread `df` across the cluster ONLY when it arrives under-partitioned
    * (fewer input splits than cores). Locally the corpus tables are single
    * small parquet files — one input split — so every narrow stage
    * (tokenize, shingle, HOF folds) would run on a single task without
    * this. At 100 TB the same input is hundreds of thousands of splits and
    * a repartition here would be a pointless full-corpus shuffle — so it
    * must be conditional on the *actual* input parallelism.
    *
    * The decision is made purely from the logical plan — never via
    * `df.rdd`, which under AQE materializes every exchange in the plan as
    * real Spark jobs whose work is then thrown away and recomputed:
    *
    *  - a plan already containing a shuffling operator (join, aggregate,
    *    window, sort, explicit repartition) executes its downstream narrow
    *    stages at `spark.sql.shuffle.partitions` — parallel enough, and
    *    repartitioning post-shuffle output would add a pure-overhead
    *    exchange;
    *  - otherwise the plan is narrow-over-scan and the scan's split count
    *    is ~ sizeInBytes / files.maxPartitionBytes, both available at plan
    *    time (catalyst stats propagate relation sizes through narrow ops).
    */
  def spread(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val p = sess.sparkContext.defaultParallelism
    val plan = df.queryExecution.optimizedPlan
    val shuffles = plan.collectFirst {
      case n @ (_: Join | _: Aggregate | _: Window | _: Sort |
                _: RepartitionOperation) => n
    }.isDefined
    if (shuffles) df
    else {
      val maxSplit = JavaUtils.byteStringAsBytes(
        sess.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
      val estSplits = plan.stats.sizeInBytes / math.max(1L, maxSplit)
      if (estSplits >= p) df else df.repartition(p)
    }
  }
}
