package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences ("concat then chunk" — the standard LLM pretraining packing).
  * Docs are laid out in a deterministic hash order within each shard, the
  * running token count is chunked at `budget` boundaries, and a doc belongs
  * to the pack its first token lands in. Reproducible under any
  * partitioning: the layout order is (md5(id), id), not arrival order.
  *
  * Scale posture: one window shuffle on the shard key. The running sum is
  * sequential per shard, so shards must be plentiful (a hash bucket or
  * source/date key), bounding each window partition — at 100 TB you pack
  * within thousands of shards, never globally.
  */
object Pack {

  /** Adds `pack_id` (0-based within shard) and `pack_off` (the doc's token
    * offset inside its pack) to `df`. A doc longer than `budget` spans
    * packs and keeps the pack it starts in.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokensCol)) / budget).cast("long"))
      .withColumn("pack_off",
        (col("__cum") - col(tokensCol)) % budget)
      .drop("__cum")
  }
}
