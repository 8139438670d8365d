package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-data generator for SCALE evidence beyond the
  * driver's read-only sf0.001/0.01/0.1 fixtures (TESTDATA.md): same ten
  * tables, same schemas and key ranges, rows scaled linearly so
  * `sf 1.0` ≈ 10× sf0.1 (6 M lineitem). Used by the round-5 sf1 bench
  * sweep — correctness stays gated on the driver fixtures; this data only
  * measures how the heavy operators' runtimes SCALE.
  *
  * Every column is a pure hash expression of the row id (xxhash64 →
  * pmod) — no RNG state, so the dataset is bit-reproducible under any
  * partitioning and re-run, and generation itself is an embarrassingly
  * parallel `spark.range`.
  *
  * Structural fidelity that matters for the timed operators:
  *  - lineitem/orders/part/supplier key densities (lines per order ≈ 4,
  *    ≈ 600 lines per supplier) drive the co-order graph sizes that
  *    pagerank/linkpred/jaccard bench against;
  *  - documents carry ~2%/25-spaced near-duplicate seeds plus a tail
  *    token, so MinHash/Jaccard candidate volumes behave like the
  *    fixtures';
  *  - embeddings are 10 label-centroid clusters + bounded noise, so IVF
  *    cell occupancy is non-degenerate.
  */
object GenData {

  private val vocab = Seq("batch", "part", "spark", "line", "column",
    "order", "small", "sort", "fast", "value", "scan", "hash", "slow",
    "group", "agg", "filter", "query", "big", "key", "window", "row",
    "table", "stream", "merge", "data", "vector")

  private def h(c: org.apache.spark.sql.Column, salt: Int) =
    xxhash64(c, lit(salt))

  private def u(c: org.apache.spark.sql.Column, salt: Int, m: Long) =
    pmod(h(c, salt), lit(m))

  /** options(1 + idx) via elt — elt's head arg can't take a splat. */
  private def pick(idx: org.apache.spark.sql.Column,
                   options: Seq[String]): org.apache.spark.sql.Column =
    elt((idx +: options.map(c => lit(c): org.apache.spark.sql.Column)): _*)

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sf = args.lift(1).map(_.toDouble).getOrElse(1.0)
    val spark = graft.Sessions.local(app = "graft-gen")
    try generate(spark, outDir, sf) finally spark.stop()
  }

  def generate(spark: SparkSession, outDir: String, sf: Double): Unit = {
    val nCust = (150000 * sf).toLong
    val nSupp = (10000 * sf).toLong
    val nPart = (200000 * sf).toLong
    val nOrd = (1500000 * sf).toLong
    val nLine = (6000000 * sf).toLong
    val nEvt = (1000000 * sf).toLong
    val nDoc = (50000 * sf).toLong
    val nEmb = (20000 * sf).toLong
    val nUsers = (15000 * sf).toLong

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    write(spark.range(5).select(col("id").cast("int").as("r_regionkey"),
      pick(col("id").cast("int") + 1, regions).as("r_name")),
      "region")

    write(spark.range(25).select(col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey")), "nation")

    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    write(spark.range(nCust).select(col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      u(col("id"), 1, 25).cast("int").as("c_nationkey"),
      round(u(col("id"), 2, 1000000) / 100.0, 2).as("c_acctbal"),
      pick(u(col("id"), 3, 5).cast("int") + 1, segs).as("c_mktsegment")), "customer")

    write(spark.range(nSupp).select(col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      u(col("id"), 4, 25).cast("int").as("s_nationkey"),
      round(u(col("id"), 5, 1000000) / 100.0, 2).as("s_acctbal")),
      "supplier")

    val adjs = Seq("large", "hot", "small", "cold", "steel", "brushed")
    val nouns = Seq("ring", "bolt", "pin", "cap", "disk", "plate")
    val types = Seq("LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM",
      "PROMO")
    write(spark.range(nPart).select(col("id").as("p_partkey"),
      concat_ws(" ", pick(u(col("id"), 6, 6).cast("int") + 1, adjs),
        pick(u(col("id"), 7, 6).cast("int") + 1, nouns)).as("p_name"),
      concat(lit("Brand#"), u(col("id"), 8, 25)).as("p_brand"),
      pick(u(col("id"), 9, 6).cast("int") + 1, types).as("p_type"),
      (u(col("id"), 10, 50) + 1).cast("int").as("p_size"),
      round(lit(900.0) + u(col("id"), 11, 10000) / 10.0, 2)
        .as("p_retailprice")), "part")

    val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    write(spark.range(nOrd).select(col("id").as("o_orderkey"),
      u(col("id"), 12, nCust).as("o_custkey"),
      elt(u(col("id"), 13, 3).cast("int") + 1,
        lit("O"), lit("F"), lit("P")).as("o_orderstatus"),
      round(u(col("id"), 14, 40000000) / 100.0, 2).as("o_totalprice"),
      // 1992-2001: seconds offset over ~9.5 years of days
      to_timestamp(date_add(lit("1992-01-01").cast("date"),
        u(col("id"), 15, 3470).cast("int"))).as("o_orderdate"),
      pick(u(col("id"), 16, 5).cast("int") + 1, pris).as("o_orderpriority")), "orders")

    write(spark.range(nLine).select(
      u(col("id"), 17, nOrd).as("l_orderkey"),
      u(col("id"), 18, nPart).as("l_partkey"),
      u(col("id"), 19, nSupp).as("l_suppkey"),
      (u(col("id"), 20, 7) + 1).cast("int").as("l_linenumber"),
      (u(col("id"), 21, 50) + 1).cast("double").as("l_quantity"),
      round(u(col("id"), 22, 10000000) / 100.0, 2).as("l_extendedprice"),
      (u(col("id"), 23, 11) / 100.0).as("l_discount"),
      (u(col("id"), 24, 9) / 100.0).as("l_tax"),
      elt(u(col("id"), 25, 3).cast("int") + 1,
        lit("A"), lit("N"), lit("R")).as("l_returnflag"),
      elt(u(col("id"), 26, 2).cast("int") + 1,
        lit("O"), lit("F")).as("l_linestatus"),
      to_timestamp(date_add(lit("1992-01-01").cast("date"),
        u(col("id"), 27, 3650).cast("int"))).as("l_shipdate")), "lineitem")

    val evTypes = Seq("click", "view", "purchase", "signup", "error")
    write(spark.range(nEvt).select(col("id").as("event_id"),
      (lit("2024-01-01 00:00:00").cast("timestamp").cast("long")
        + u(col("id"), 28, 30L * 86400)).cast("timestamp").as("ts"),
      u(col("id"), 29, nUsers).as("user_id"),
      pick(u(col("id"), 30, 5).cast("int") + 1, evTypes).as("event_type"),
      round(u(col("id"), 31, 10000) / 100.0, 2).as("value"),
      format_string("{\"k\": %d}", u(col("id"), 32, 100)).as("props")),
      "events")

    // documents: ~4% of docs re-generate the PREVIOUS doc's token stream
    // and append a distinct tail token — a near-duplicate at Jaccard
    // n/(n+2), the candidate structure the dedup family benches against.
    val langs = Seq("en", "es", "fr", "de", "zh")
    val seed = when(u(col("id"), 33, 25) === 0 && col("id") > 0,
      col("id") - 1).otherwise(col("id"))
    val nTok = u(seed, 34, 80) + lit(12)
    val words = transform(sequence(lit(1), nTok),
      i => pick(pmod(xxhash64(seed, i), lit(vocab.size)).cast("int") + 1,
        vocab))
    val text0 = array_join(words, " ")
    val text = when(seed === col("id"), text0)
      .otherwise(concat(text0, lit(" "),
        pick(u(col("id"), 35, vocab.size).cast("int") + 1, vocab)))
    val langPick = u(col("id"), 36, 20)
    write(spark.range(nDoc).select(col("id").as("doc_id"),
      text.as("text"),
      when(langPick < 8, lit("en"))
        .otherwise(pick((langPick % 4).cast("int") + 2, langs)).as("lang"),
      concat(lit("src"), u(col("id"), 37, 20)).as("source"),
      length(text).as("n_chars")), "documents")

    // embeddings: 10 cluster centroids (hash of label) + bounded noise,
    // 64 dims — IVF/PQ cells fill non-degenerately.
    val label = u(col("id"), 38, 10)
    val emb = transform(sequence(lit(0), lit(63)),
      j => ((pmod(xxhash64(label, j), lit(2001)) / 1000.0 - 1.0)
        + (pmod(xxhash64(col("id"), j, lit(39)), lit(401)) / 1000.0 - 0.2))
        .cast("float"))
    write(spark.range(nEmb).select(col("id").as("vec_id"),
      emb.as("embedding"), label.cast("int").as("label")), "embeddings")
  }
}
