package graft

import org.apache.spark.sql.SparkSession
import scala.util.chaining._

/** SparkSession factory carrying the reference's execution-config envelope
  * (reference: k8s/submit/etl-on-gcp-vinicius-campos.py:67-88) adapted for
  * Spark 4.x. Two profiles: `local` for tests/bench (local[N], UI off) and
  * `withDefaults` for composing into an externally-built session (cluster).
  *
  * Deliberate deviation — `enableHiveSupport()`
  * (etl-on-gcp-vinicius-campos.py:69): the reference enables the Hive
  * catalog because Dataproc wires table metadata through a Hive
  * metastore. This engine's catalog surface (S7 temp views, S9/O7
  * warehouse tables) runs on Spark's built-in in-memory/`spark_catalog`
  * session catalog: every gated operation (create database, saveAsTable,
  * truncate-load, SQL over views) is catalog-implementation-agnostic, so
  * Hive classes would add a dependency and a metastore requirement
  * without changing any observable behavior (SURVEY.md §4.2). A
  * deployment that needs shared persistent metadata composes
  * `withDefaults` into a builder that has `enableHiveSupport()` or a
  * `spark.sql.catalog.*` plugin set — nothing here conflicts with either.
  *
  * Scale posture: AQE on (runtime re-plan + skew-join splitting), shuffle
  * coalescing to 128 MB advisory partitions, Kryo, committer v2 — the same
  * knobs the reference ships, which are also the right defaults for a
  * 1000-executor / 100 TB run. `spark.sql.shuffle.partitions` is sized by
  * the caller (cores locally; ~2-3x total cores on a cluster).
  */
object Sessions {

  /** Reference config envelope (etl-on-gcp-vinicius-campos.py:67-88), plus
    * the engine's SQL function extensions (vec_dot / vec_cosine).
    */
  def withDefaults(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.join.preferSortMergeJoin", "true")
    .config("spark.sql.broadcastTimeout", "900")
    .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    .config("spark.speculation", "false")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.debug.maxToStringFields", "100")
    // The generated-class cache defaults to 100 entries; a workload with
    // more codegen units than that (this engine's full query set has
    // several hundred) LRU-thrashes it, and recompilation serializes every
    // executor thread behind the compile KeyLock — observed as progressive
    // 3-10x slowdowns. Size it for the workload.
    .config("spark.sql.codegen.cache.maxEntries", "5000")
    // ObjectHashAggregate (the exec for TypedImperativeAggregates like
    // MinHashAgg) falls back to SORT-based aggregation after only 128
    // distinct keys per task — a full sort of every shingle row once the
    // corpus has more than 128 docs per partition. Budget: a MinHash buffer
    // is k longs (~1 KB at production k=128), and the threshold is
    // *per task*, so in-flight memory ≈ threshold × 1 KB × concurrent
    // tasks. At 64k that is ~64 MB/task → ~2 GB across 32 local cores —
    // comfortable in the 8 GB test heap; the sort fallback still guards
    // pathological group counts beyond it. Cluster profiles should
    // re-derive: threshold ≈ (executor heap × 0.2) / (k × 8 B × cores).
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
    // BloomFilterAggregate validates its item/bit arguments against these
    // runtime-filter confs even when constructed explicitly (BloomOps).
    // The defaults (4M items / 67M bits) are sized for join runtime
    // filters; membership sketches over whole edge sets (k-truss closure
    // pre-filter) and shingle vocabularies legitimately carry 10-100M
    // keys. 2^30 bits = 128 MB is the ceiling a sketch literal may reach;
    // BloomOps caps its optimal-bits request to the same bound so fpp
    // degrades gracefully instead of failing past it.
    .config("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "100000000")
    .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "1073741824")
    // ... but those raised caps also govern the optimizer's AUTOMATIC
    // InjectRuntimeFilter on every eligible shuffle join, which then
    // builds up-to-128MB bloom filters as a side effect of joins that are
    // already hand-planned (broadcast hints, pre-partitioned invariants,
    // explicit BloomOps sketches where a membership filter actually pays).
    // Measured tax with injection on at the raised caps: x2_minhash_k64
    // 3.06 -> 2.10s and x8_bfs 8.25 -> 6.81s when disabled (isolated
    // 3-run medians) — a uniform 1.3-1.7x on the join-heavy family for
    // zero selectivity benefit, since every hot join here keys on
    // already-minimal digest/band tables. Auto-injection stays OFF;
    // explicit BloomFilterAggregate construction (BloomOps) is unaffected
    // and keeps the raised ceilings above.
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    // events.ts is parquet TIMESTAMP(NANOS): surfaced as nanos-since-epoch
    // LongType (Tables.scala normalizes it back to TimestampType @ micros).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Micro-precision parquet timestamps without the UTC-adjusted flag
    // would otherwise surface as TIMESTAMP_NTZ, which unix_millis & co
    // reject; reading them as session-time (UTC) instants matches both
    // the nanos-era behavior above and the DuckDB oracle's naive
    // timestamp semantics.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // Probe seam: SPARK_GRAFT_CONF="k=v;k2=v2" applies conf overrides
    // LAST, so an A/B conf bisect runs through the exact entrypoints
    // (Bench/Verify child JVMs) that produce the artifacts — the r8
    // bloom A/B was run through a hand-overridden session whose OTHER
    // confs could differ, which is precisely the ambiguity the r9
    // verdict flagged in its residual-gap adjudication. Empty/unset =
    // no effect; never set by the driver. Also re-applied at the end of
    // [[local]] and [[cluster]], whose own .config calls run after this
    // one (review r10: an override of e.g. shuffle.partitions would
    // otherwise be silently re-clobbered and the A/B would measure
    // nothing).
    .pipe(applyEnvConf)

  /** JVM-global scope caveat: the seam reads the process environment, so
    * EVERY session built in this JVM (e.g. a spec's [[local]] while Bench
    * runs) inherits the same overrides — fine for the single-session
    * artifact flows it exists for, not a per-session knob. Malformed
    * entries with an empty key ("=v") are dropped rather than setting an
    * empty-string conf key, and every override actually applied is echoed
    * to stderr so an artifact produced under a lingering probe env var
    * records that it ran with a non-default conf (ADVICE r10).
    */
  private def applyEnvConf(b: SparkSession.Builder): SparkSession.Builder =
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains("="))
      .foldLeft(b) { (bb, kv) =>
        // Trim around '=' too: "k = v" must set key "k", not "k ".
        val Array(k, v) = kv.split("=", 2).map(_.trim)
        if (k.isEmpty) bb
        else {
          System.err.println(s"[graft] SPARK_GRAFT_CONF override: $k=$v")
          bb.config(k, v)
        }
      }

  /** The reference knobs that only make sense with real executors
    * (etl-on-gcp-vinicius-campos.py:74-83): dynamic allocation + external
    * shuffle service (executors can scale down without losing shuffle
    * files) and the AQE coalesce floor/ceiling the reference pins
    * (`minPartitionNum=1`, `initialPartitionNum=10` :77-78 — locally we
    * keep the initial partition count at core count instead; on a
    * 1000-executor cluster the caller sizes `spark.sql.shuffle.partitions`
    * to 2-3× total cores and AQE coalesces down from there).
    *
    * PAIR dynamic allocation with `graft.checkpoint.dir` (see
    * [[org.apache.spark.sql.graft.FreshCheckpoint]]): the external
    * shuffle service preserves SHUFFLE files across a downscale, but
    * iterative operators pin each round as a CHECKPOINT block, and in
    * the default localCheckpoint mode those blocks live only on
    * executors — a downscale mid-iteration is then an unrecoverable
    * missing-block failure. Set `graft.checkpoint.dir` to a
    * fault-tolerant path (HDFS/object store) on any elastic cluster so
    * round pins survive executor churn; leave it unset locally where
    * zero-IO rounds are the right trade.
    */
  val clusterEnvelope: Map[String, String] = Map(
    "spark.dynamicAllocation.enabled" -> "true",
    // The reference's allocation sizing (etl-on-gcp-vinicius-campos
    // .py:81-83): floor 5, start 10, ceiling 30 executors. Carried
    // verbatim as the envelope's default; a 1000-executor deployment
    // overrides maxExecutors, the ratio (floor ≈ ceiling/6, start ≈
    // ceiling/3) is the part worth keeping.
    "spark.dynamicAllocation.minExecutors" -> "5",
    "spark.dynamicAllocation.initialExecutors" -> "10",
    "spark.dynamicAllocation.maxExecutors" -> "30",
    "spark.shuffle.service.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.minPartitionNum" -> "1",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "10")

  /** Cluster profile: `withDefaults` + [[clusterEnvelope]]; the env
    * probe seam is re-applied last so it wins over the envelope too.
    */
  def cluster(b: SparkSession.Builder): SparkSession.Builder =
    applyEnvConf(clusterEnvelope.foldLeft(withDefaults(b)) {
      case (bb, (k, v)) => bb.config(k, v)
    })

  def local(
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      app: String = "graft"): SparkSession = {
    val s = applyEnvConf(withDefaults(
      SparkSession.builder().master(s"local[$cores]").appName(app))
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Scratch.warehouse))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Scratch locations — kept inside the repo per the sandbox contract. */
object Scratch {
  val scratch = "/root/repo/target/tmp"
  val warehouse = "/root/repo/target/spark-warehouse"
  def fresh(prefix: String): String = {
    val d = new java.io.File(
      scratch, s"$prefix-${java.util.UUID.randomUUID.toString.take(8)}")
    d.mkdirs()
    d.getAbsolutePath
  }
}
