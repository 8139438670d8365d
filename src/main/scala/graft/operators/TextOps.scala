package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives for large-scale corpus processing
  * (mandated extension X5, SURVEY.md §2.4; the reference itself has no text
  * functions — its corpus ops are schema-inferred passthrough, see
  * reference k8s/submit/etl-on-gcp-vinicius-campos.py:22-31).
  *
  * Everything here is built from codegen'd Spark SQL functions (split /
  * transform / filter / aggregate higher-order functions) — no UDFs — so the
  * expressions stay inside whole-stage codegen and scale linearly with input
  * on a cluster.
  */
object TextOps {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenization: alphanumeric runs and non-space
    * punctuation runs, by extraction (for token *counting*, not real BPE).
    * The pattern is RE2-compatible (no lookaround), so any engine with the
    * same regex semantics reproduces it exactly — which is what lets the
    * token counts hash-match the oracle.
    */
  val bpePattern = "[A-Za-z0-9]+|[^A-Za-z0-9 ]+"

  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** n-word shingles joined by a single space; empty array when the doc has
    * fewer than n tokens. (Guard matters: Spark `sequence(1, 0)` would
    * generate a *descending* sequence, not an empty one.)
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Count of tokens contained in a fixed vocabulary. */
  def vocabCount(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isin(vocab.map(x => x: Any): _*)))

  /** Language-ID stopword profiles. Deterministic tie-break: profile order
    * below (first profile reaching the max score wins, `und` when all 0).
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "es"),
    "fr" -> Seq("le", "les", "des", "et", "une", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"))

  /** Predicted language from stopword-overlap scores. */
  def langId(toks: Column): Column = {
    val scores = langProfiles.map { case (l, words) => l -> vocabCount(toks, words) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), els) =>
      when(s > 0 && s >= best, lit(l)).otherwise(els)
    }
  }

  /** MD5 content fingerprint (hex string) — portable across engines. */
  def md5Fingerprint(text: Column): Column = md5(text)

  /** Pattern redaction (PII scrub): replace every match of each pattern
    * with its replacement token, in pattern order. Patterns must be
    * RE2-compatible (no lookaround, no backrefs) so any engine reproduces
    * the rewrite exactly. Pure codegen'd projection — the 100 TB shape of a
    * PII pass is "one narrow map over the corpus", and this is it.
    */
  def redact(text: Column, patterns: Seq[(String, String)]): Column =
    patterns.foldLeft(text) { case (c, (re, repl)) =>
      regexp_replace(c, re, repl)
    }

  /** Total match count across the redaction patterns — the audit metric a
    * privacy pass reports per document.
    */
  def redactHits(text: Column, patterns: Seq[String]): Column =
    patterns.map(re => regexp_count(text, lit(re))).reduce(_ + _)

  /** Default PII pattern set: emails, international-ish phone numbers,
    * IPv4 addresses. ASCII-only, RE2-safe.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?[0-9][0-9()\\- ]{7,}[0-9]" -> "<PHONE>",
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "<IP>")

  /** Winnowing fingerprints (the MOSS algorithm): hash every k-gram, slide
    * a w-position window over the hash sequence, keep each window's
    * minimum — the classic guarantee that any match of length >= w+k-1
    * between two documents shares at least one selected fingerprint, at
    * ~2/(w+1) selection density. md5 hex compares lexicographically like
    * numerically (fixed-width lowercase), so the minima are engine-portable
    * with no numeric conversion. Trailing partial windows are kept (both
    * engines compute the same frame, and they only ever *add* the tail
    * k-grams' own hashes).
    *
    * Scale posture: one per-doc window (shuffle on doc id) + distinct.
    * Output: distinct (idCol, fp) pairs.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame = {
    require(w > 0, "window w must be positive")
    val sh = Par.spread(df).select(col(idCol),
      posexplode(shingles(tokens(col(textCol)), k)).as(Seq("pos", "sh")))
      .select(col(idCol), col("pos"), md5(col("sh")).as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    sh.select(col(idCol), min(col("h")).over(win).as("fp")).distinct()
  }

  /** BM25 top-k retrieval for a fixed query-term set, in an arithmetic
    * form that is bit-identical across engines:
    *
    *   - idf is the RATIONAL core of the Robertson-Sparck Jones weight,
    *     `(2(N - df) + 1) / (2 df + 1)` — the inside of the standard
    *     `log((N - df + 0.5)/(df + 0.5))`, doubled to stay integer. The
    *     log is a monotone transform, so per-term ranking is unchanged,
    *     and dropping it removes the one libm call whose last-ulp
    *     rounding differs across engines.
    *   - k1 = 1.5 and b = 0.75 are DYADIC, so `tf·(k1+1)` and
    *     `1 − b + b·dl/avgdl` round identically everywhere.
    *   - the per-doc score sums per-term scores in the FIXED order of
    *     `terms` via a left-associated fold over conditional aggregates
    *     (never a groupBy SUM, whose partial-aggregation order is
    *     nondeterministic for doubles).
    *
    * Scale posture: token explode is filtered to the query terms BEFORE
    * the (doc, term) tf aggregate, so only matching postings shuffle; df
    * and the corpus stats are term-/one-row-sized broadcasts; global
    * top-k plans as TakeOrderedAndProject (no single-partition window).
    *
    * Output: (idCol, dl, score) for the topK docs under the total order
    * (score desc, idCol).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], topK: Int): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = Par.spread(df)
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        size(col("__toks")).cast("long").as("dl"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = toks
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms.map(x => x: Any): _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df0"))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        ((col("n_docs") - col("df0")) * 2 + 1).cast("double")
          / (col("df0") * 2 + 1).cast("double"))
      .withColumn("s",
        col("idf") * (col("tf").cast("double") * lit(2.5))
          / (col("tf").cast("double")
            + lit(1.5) * (lit(0.25)
              + lit(0.75) * (col("dl").cast("double") / col("avgdl")))))
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("s"))).as(s"__s$i")
    }
    val agg = scored.groupBy(col(idCol), col("dl"))
      .agg(perTerm.head, perTerm.tail: _*)
    val score = terms.indices
      .map(i => coalesce(col(s"__s$i"), lit(0.0)))
      .reduceLeft(_ + _)
    agg.select(col(idCol), col("dl"), score.as("score"))
      .orderBy(col("score").desc, col(idCol)).limit(topK)
  }

  /** One BPE training round: find the globally most frequent adjacent
    * token pair (ties to the lexicographically smallest pair — the
    * deterministic tie rule real tokenizer trainers need but rarely
    * document), then merge its occurrences with a single greedy
    * non-overlapping left-to-right text pass (the streaming-scanner
    * form; `replace` has identical semantics in every engine). Iterating
    * this operator IS BPE vocabulary learning; one round is the
    * distributed unit of work.
    *
    * Scale posture: one bigram explode into a count aggregate (map-side
    * partials absorb the stream), a 1-row top-1 via
    * TakeOrderedAndProject, broadcast back over the corpus as a pure
    * projection — the corpus itself never shuffles.
    *
    * Output: the input columns plus (best_pair, text_merged).
    */
  def bpeMergeRound(df: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val pairs = Par.spread(df)
      .select(explode(shingles(tokens(col(textCol)), 2)).as("pair"))
    val best = pairs.groupBy("pair").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("pair")).limit(1)
      .select(col("pair"), translate(col("pair"), " ", "_").as("merged"))
    df.crossJoin(broadcast(best))
      .withColumn("best_pair", col("pair"))
      .withColumn("text_merged", expr(s"replace($textCol, pair, merged)"))
      .drop("pair", "merged")
  }

  /** BPE VOCABULARY LEARNING: [[bpeMergeRound]] iterated `rounds` times —
    * the tokenizer-training loop an LLM pipeline actually runs. Per round
    * the globally most frequent adjacent token pair (ties to the
    * lexicographically smallest, the deterministic trainer rule) is
    * merged corpus-wide by the greedy non-overlapping left-to-right
    * scanner, and the pair enters the vocabulary with its rank and its
    * pre-merge frequency. BPE's global argmax makes the rounds
    * inherently sequential — that is the algorithm, not an
    * implementation choice.
    *
    * Scale posture: a round is one bigram explode into a count aggregate
    * (map-side partials absorb the stream) + a 1-row top-1 collected to
    * the driver; the merge itself is a pure codegen `replace` projection
    * with LITERAL search/replacement (no join, no broadcast, the corpus
    * never shuffles). Rounds stack projections on the scan, so round r
    * re-derives r-1 merges map-side — linear plan growth, bounded by
    * `rounds`, and exactly how a distributed trainer amortizes at 100 TB
    * (the alternative — materializing the merged corpus per round —
    * writes the whole corpus `rounds` times).
    *
    * Output: (rank, pair, merged, freq) — the ranked merge table, one
    * row per learned merge (fewer if the corpus runs out of repeated
    * bigrams early).
    */
  def bpeLearnVocab(df: DataFrame, idCol: String, textCol: String,
                    rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, "rounds in [1,64]")
    val spark = df.sparkSession
    var cur = df.select(col(idCol), col(textCol).as("__txt"))
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val best = Par.spread(cur)
        .select(explode(shingles(tokens(col("__txt")), 2)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val merged = pair.replace(' ', '_')
        merges += ((r.toLong, pair, merged, best(0).getLong(1)))
        cur = cur.withColumn("__txt",
          org.apache.spark.sql.functions.replace(
            col("__txt"), lit(pair), lit(merged)))
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "pair", "merged", "freq")
  }

  /** BPE ENCODE: apply a learned ranked merge table to a text column —
    * every merge in rank order via the same greedy non-overlapping
    * left-to-right scanner the trainer used. Applying merges in learned
    * rank order over the space-joined token string IS the standard BPE
    * encode step ("apply merges in order"); decoupling it from training
    * is what lets one trained vocabulary tokenize every future batch.
    *
    * The merge table arrives as driver-side (pair, merged) rows, bounded
    * by the [[bpeLearnVocab]] rounds contract (≤64): each merge becomes a
    * LITERAL codegen `replace` stacked on the scan — no join, no
    * broadcast, the corpus never shuffles. A production-size vocabulary
    * (tens of thousands of merges) exceeds projection stacking; the
    * 100 TB shape for that regime is the identical scanner run per
    * partition against a broadcast rank map — the semantics pinned here
    * (rank order, scanner form) are the part that carries over.
    *
    * Output: the input columns plus (text_encoded, n_tokens_raw,
    * n_tokens_encoded).
    */
  def bpeEncode(df: DataFrame, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    require(merges.length <= 64,
      "merge table bounded by the bpeLearnVocab contract (<= 64 rounds)")
    val encoded = merges.foldLeft(col(textCol)) { case (c, (pair, merged)) =>
      org.apache.spark.sql.functions.replace(c, lit(pair), lit(merged))
    }
    df.withColumn("text_encoded", encoded)
      .withColumn("n_tokens_raw", size(tokens(col(textCol))).cast("long"))
      .withColumn("n_tokens_encoded",
        size(tokens(col("text_encoded"))).cast("long"))
  }

  /** Hashing-trick bag-of-words: tokens are bucketed by the first
    * `hexDigits` characters of their md5 (16^hexDigits buckets), counts
    * aggregated per (doc, bucket) — the fixed-width sparse feature vector
    * linear text classifiers train on, with no vocabulary table to build,
    * broadcast, or keep consistent across batches.
    *
    * Scale posture: explode + one (doc, bucket) hash aggregate with
    * map-side partials; bucketing is a pure codegen projection (md5 +
    * substring), so no vocabulary join ever happens — the property that
    * makes the hashing trick the 100 TB feature extractor. md5 keeps the
    * bucket assignment engine-portable (the oracle replays it verbatim).
    *
    * Output: (idCol, bucket, cnt) — sparse rows, absent buckets are zero.
    */
  def hashFeatures(df: DataFrame, idCol: String, textCol: String,
                   hexDigits: Int = 1): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 8, "hexDigits in [1,8]")
    Par.spread(df)
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .select(col(idCol), substring(md5(col("tok")), 1, hexDigits).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Per-document repetition metrics (Gopher-style quality rules): the
    * duplicate-word fraction and the share of all bigrams taken by the
    * single most frequent bigram. High values flag boilerplate / template
    * spam that length or stopword ratios miss.
    *
    * Scale posture: one explode + two-level groupBy on (doc, bigram) —
    * map-side partial aggregation absorbs the per-doc skew; no UDFs.
    * Docs with fewer than 2 tokens have no bigrams and are dropped (inner
    * join) — the curation contract for sub-sentence fragments is a length
    * filter upstream, not a repetition score.
    *
    * Output: (idCol, n_words, n_distinct, dup_word_frac, top_bigram_n,
    * top_bigram_frac).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = Par.spread(df).select(col(idCol), tokens(col(textCol)).as("toks"))
    val words = base.select(col(idCol),
      size(col("toks")).cast("long").as("n_words"),
      size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
    val bg = base
      .select(col(idCol), explode(shingles(col("toks"), 2)).as("bg"))
      .groupBy(idCol, "bg").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(max(col("c")).as("top_bigram_n"),
        sum(col("c")).as("n_bigrams"))
    words.join(bg, Seq(idCol))
      .select(col(idCol), col("n_words"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") /
          col("n_words").cast("double")).as("dup_word_frac"),
        col("top_bigram_n"),
        (col("top_bigram_n").cast("double") /
          col("n_bigrams").cast("double")).as("top_bigram_frac"))
  }

  /** Corpus-duplication diagnostic (the memorization-risk number from
    * exact-substring dedup work): per document, the fraction of its n-gram
    * OCCURRENCES whose n-gram also appears in at least one OTHER document.
    * A high fraction means the doc is largely assembled from text the
    * model will see again elsewhere — the segment-dedup / decontamination
    * trigger, measured before committing to either.
    *
    * Scale posture: occurrences reduce to per-(doc, gram) counts first
    * (one aggregate, map-side combine — the gram table, not the token
    * stream, is what shuffles); cross-doc document frequency is one
    * aggregate over that already-distinct-per-doc table; the join back is
    * gram-keyed — never doc × doc. At 100 TB the gram key would be a
    * 128-bit hash to bound shuffle width; the string key here keeps the
    * oracle engine-identical.
    *
    * Output: (idCol, n_grams, n_dup, dup_frac) — `dup_frac` one double
    * division of two exact longs.
    */
  def dupNgramStats(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    val grams = Par.spread(df)
      .select(col(idCol), explode(shingles(tokens(col(textCol)), n)).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as("c"))
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("df"))
    grams.join(dfreq, "g")
      .groupBy(idCol)
      .agg(sum("c").as("n_grams"),
        sum(when(col("df") >= 2, col("c")).otherwise(0L)).as("n_dup"))
      .select(col(idCol), col("n_grams"), col("n_dup"),
        (col("n_dup").cast("double") / col("n_grams").cast("double"))
          .as("dup_frac"))
  }

  /** Order-aware n-gram NOVELTY: per document, the fraction of its
    * distinct n-grams whose FIRST corpus occurrence (minimum id) is this
    * document — i.e. how much genuinely new material each document adds
    * given everything before it in id order. Where [[dupNgramStats]] is
    * symmetric (appears-anywhere-else), novelty is directional: stream a
    * growing corpus through it and the per-doc curve is the freshness
    * signal that drives "stop crawling this source" / curriculum-by-
    * recency decisions.
    *
    * First-occurrence attribution via min(id) per n-gram is exact and
    * order-independent to COMPUTE (any partitioning) while being
    * order-AWARE in meaning (id = ingestion order by contract).
    *
    * Scale posture: distinct (id, gram) pairs, one gram-keyed min
    * aggregate, one gram-keyed join back, one id-keyed count — the same
    * inverted-index discipline as the dedup family, never doc × doc.
    */
  def noveltyStats(df: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    val grams = Par.spread(df)
      .select(col(idCol), explode(shingles(tokens(col(textCol)), n)).as("g"))
      .distinct()
    val first = grams.groupBy("g").agg(min(col(idCol)).as("__first"))
    grams.join(first, "g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col(idCol) === col("__first"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col(idCol), col("n_distinct"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_distinct").cast("double"))
          .as("novel_frac"))
  }

  /** Boilerplate removal (the CCNet/RefinedWeb repeated-line strip): drop
    * every segment that appears in at least `minDf` DISTINCT documents of
    * the same scope (e.g. per-source — navigation chrome, footers, cookie
    * banners repeat within a site), and rebuild each doc from what
    * survives. Unlike [[graft.operators.Dedup.segmentDedup]] (keep-FIRST:
    * one copy of repeated material survives somewhere), this removes
    * high-frequency material from EVERY document including the first —
    * frequency, not precedence, defines boilerplate. The corpus has no
    * newlines, so segments are fixed `segWords`-word windows.
    *
    * Scale posture: document frequency reduces on the (scope, segment,
    * doc) -distinct table (map-side combine; the segment histogram, not
    * the token stream, is what aggregates); the filter joins back
    * segment-keyed — never doc × doc — and AQE splits hot-segment skew;
    * reassembly is one groupBy(doc). At 100 TB the segment key would be a
    * 128-bit hash; the string key here keeps the oracle engine-identical.
    *
    * Output: (idCol, n_seg, n_kept, text_kept) for every input doc; a doc
    * of pure boilerplate keeps n_kept = 0 and an empty text.
    */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       segWords: Int, minDf: Int,
                       scopeCols: Seq[String] = Nil): DataFrame = {
    require(segWords > 0, "segWords must be positive")
    require(minDf > 1, "minDf must be at least 2")
    val toks = tokens(col(textCol))
    val nseg = ceil(size(toks).cast("double") / segWords).cast("int")
    val scope = scopeCols.map(col)
    val segs = Par.spread(df)
      .select(col(idCol) +: scope :+
        posexplode(transform(sequence(lit(0), nseg - 1),
          i => array_join(slice(toks, i * segWords + 1, lit(segWords)), " ")))
          .as(Seq("pos", "seg")): _*)
    val dfreq = segs.groupBy(scope :+ col("seg"): _*)
      .agg(countDistinct(col(idCol)).as("__df"))
    val kept = segs.join(dfreq, scopeCols :+ "seg")
      .filter(col("__df") < minDf)
    val tot = df.select(col(idCol), nseg.cast("long").as("n_seg"))
    val reb = kept.groupBy(idCol).agg(
      count(lit(1)).cast("long").as("n_kept"),
      concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
          x => x.getItem("seg"))).as("text_kept"))
    tot.join(reb, Seq(idCol), "left")
      .select(col(idCol), col("n_seg"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /** Corpus-frequency quality signals (the CCNet-style "does this document
    * look like the corpus" measure, log-free so it gates exactly): per
    * document, over its DISTINCT tokens — how many are rare corpus-wide
    * (document frequency < `minDf`) and the mean document frequency. Docs
    * dominated by rare/unseen tokens are OCR garbage, lorem ipsum, or
    * another language; docs of only ultra-common tokens are boilerplate.
    *
    * Scale posture: the document-frequency table is vocabulary-sized (not
    * corpus-sized) and is built by one groupBy over distinct (doc, token)
    * pairs; the probe side joins tokens against it (sort-merge at scale,
    * AQE-broadcast when the vocab is small) and re-aggregates per doc. Two
    * keyed shuffles + one vocab join — no UDFs, no driver state.
    *
    * Output: (idCol, n_tok, n_rare, rare_frac, mean_df) — `mean_df` as one
    * double division of two exact longs (IEEE-deterministic).
    */
  def corpusFreqQuality(df: DataFrame, idCol: String, textCol: String,
                        minDf: Long): DataFrame = {
    val dtok = Par.spread(df)
      .select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("tok"))
    val dfTab = dtok.groupBy("tok").agg(count(lit(1)).as("df"))
    dtok.join(dfTab, "tok")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("df") < minDf, 1L).otherwise(0L)).as("n_rare"),
        sum("df").as("__sum_df"))
      .select(col(idCol), col("n_tok"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_tok").cast("double"))
          .as("rare_frac"),
        (col("__sum_df").cast("double") / col("n_tok").cast("double"))
          .as("mean_df"))
  }

  /** Linear quality-model scoring: a fixed-weight linear model over the
    * standard per-doc quality features (type-token ratio, stopword ratio,
    * average token length) — the shape of "apply a trained quality
    * classifier to the corpus" with the training externalized (weights are
    * config). The score is one fixed-order multiply-add chain of exact
    * ratios, so identical expression trees produce identical IEEE doubles
    * in any engine — unlike sigmoid/log scoring, it gates exactly.
    * Monotone in the logit, so threshold-filtering on it IS
    * classifier-filtering. Pure codegen projection: no shuffle.
    */
  def linearQualityScore(text: Column, bias: Double, wTtr: Double,
                         wStop: Double, wAvgLen: Double,
                         stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio = vocabCount(toks, stopwords).cast("double") / nTok
    val avgLen = (length(text) - size(toks) + 1).cast("double") / nTok
    lit(bias) + lit(wTtr) * ttr + lit(wStop) * stopRatio + lit(wAvgLen) * avgLen
  }

  /** Rolling polynomial hash: base-31 recurrence over character codes,
    * reduced mod 1e9+7 at every step so it never overflows a 64-bit long
    * (Spark 4 runs ANSI mode — unchecked long overflow throws) and stays
    * bit-portable to any engine with the same fold. Codegen'd HOF, no UDF.
    */
  val rollingHashMod: Long = 1000000007L

  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * lit(31L) + c) % lit(rollingHashMod))

  /** Overlapping token-window CHUNKING — split long documents into
    * `width`-token windows every `stride` tokens (stride < width ⇒
    * overlapping context, the shape RAG indexing and context-window
    * training prep actually use; x6_pack is the inverse op, packing short
    * docs *into* windows). Chunk count = floor((max(n-width,0)+stride-1)
    * / stride) + 1, so every token lands in at least one chunk and a doc
    * no longer than `width` yields exactly one.
    *
    * Scale posture: pure per-row projection + explode — no shuffle, no
    * UDFs; the 100 TB form of "chunk the corpus" is one codegen'd map.
    * The arithmetic is integer-exact (the floor-of-double division is
    * exact for any real document length), so chunk boundaries are
    * engine-portable.
    *
    * Output: (idCol, chunk_id, chunk, n_tok), chunk_id 0-based.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width,
      "need 1 <= stride <= width (stride > width would drop tokens)")
    val base = Par.spread(df).select(col(idCol), tokens(col(textCol)).as("toks"))
    val n = size(col("toks"))
    val nChunks = floor(
      (greatest(n - lit(width), lit(0)) + lit(stride - 1)).cast("double") /
        lit(stride.toDouble)).cast("int") + lit(1)
    base.select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(col("toks"), i * lit(stride) + 1, lit(width))))
          .as(Seq("chunk_id", "ctoks")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        array_join(col("ctoks"), " ").as("chunk"),
        size(col("ctoks")).cast("long").as("n_tok"))
  }

  /** Bigram language-model corpus scoring (the CCNet-style "how much does
    * this document look like the corpus" perplexity signal, in a gate-exact
    * formulation): train bigram conditional probabilities p(w2|w1) =
    * c(w1 w2) / c(w1 ·) over the whole corpus, then score each document by
    * the mean probability of its bigram occurrences. Log-free on purpose —
    * ln() is libm-dependent and breaks cross-engine bit-equality, while
    * each p here is one double division of two exact longs and the mean
    * accumulates on the fixed-point 1e-12 grid (floor(p*1e12) summed as
    * exact decimals), so every step is IEEE-identical in any engine.
    * Low-scoring docs are OCR garbage / wrong-language / shuffled text;
    * the score is monotone in the (truncated) average likelihood, so
    * threshold-filtering on it is LM-filtering.
    *
    * Scale posture: the model is vocabulary²-bounded (bigram-type-sized,
    * not corpus-sized) — one groupBy builds it; scoring joins occurrences
    * against it (sort-merge at scale, AQE-broadcast when small) and
    * re-aggregates per doc. Three keyed shuffles total, no driver state,
    * no UDFs.
    *
    * Output: (idCol, n_bigrams, avg_p); docs with < 2 tokens have no
    * bigrams and are dropped (length-filter upstream is the curation
    * contract for fragments, as in [[repetitionStats]]).
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = Par.spread(df).select(col(idCol),
      explode(shingles(tokens(col(textCol)), 2)).as("bg"))
    val c2 = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val model = c2.join(c1, "w1")
      .select(col("bg"),
        (col("c2").cast("double") / col("c1").cast("double")).as("p"))
    bg.join(model, "bg")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(floor(col("p") * lit(1e12)).cast("decimal(38,0)")).as("__s"))
      .select(col(idCol), col("n_bigrams"),
        (col("__s").cast("double") / lit(1e12) /
          col("n_bigrams").cast("double")).as("avg_p"))
  }

  /** 16-bit SimHash over *distinct* tokens, materialized as a '0'/'1' string.
    * Bit i is the sign of sum over tokens of +-1 depending on the high bit of
    * hex digit i of md5(token). md5 keeps it engine-portable; swap for
    * xxhash64 on a production cluster.
    */
  def simhashBits(distinctToks: Column): Column = {
    val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val bits = (0 until 16).map { i =>
      val contrib = aggregate(
        distinctToks,
        lit(0),
        (acc, t) => acc +
          when(substring(md5(t), i + 1, 1).isin(hi.map(x => x: Any): _*), 1)
            .otherwise(-1))
      when(contrib > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Corpus distribution drift: per-token two-sample χ² contributions
    * between corpora A and B over their union vocabulary, add-one
    * smoothed —
    *
    *   `χ²(t) = (n₂·a − n₁·b)² / (n₁·n₂·(a + b))`,  a = c₁+1, b = c₂+1
    *
    * — the distribution-shift detector a training pipeline runs between
    * crawl snapshots / domain mixes; ranking by χ² surfaces the tokens
    * driving the drift. χ² (not KL/JSD) deliberately: it is RATIONAL in
    * the counts, so no logarithm — whose last-ulp rounding is
    * engine-specific — ever enters, and the double arithmetic is a fixed
    * tree over exact integers (products stay below 2⁵³ through corpora of
    * ~10⁸ tokens; beyond that, pre-aggregate counts per shard and rescale
    * before the χ² pass).
    *
    * Scale posture: two token hash-aggregates (map-side partials over the
    * explode — the only corpus-sized work), a vocabulary-sized full-outer
    * join, totals as a one-row broadcast; the χ² itself is a projection
    * over |V| rows.
    */
  def tokenDrift(dfA: DataFrame, dfB: DataFrame,
                 textCol: String): DataFrame = {
    def tokCounts(df: DataFrame, out: String) =
      df.select(explode(tokens(col(textCol))).as("token"))
        .groupBy("token").agg(count(lit(1)).as(out))
    val j = tokCounts(dfA, "__ca").join(tokCounts(dfB, "__cb"),
        Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("__ca"), lit(0L)).as("c1"),
        coalesce(col("__cb"), lit(0L)).as("c2"))
      .withColumn("__a", col("c1") + 1).withColumn("__b", col("c2") + 1)
    val tot = j.agg(sum("__a").as("__n1"), sum("__b").as("__n2"))
    val (a, b) = (col("__a").cast("double"), col("__b").cast("double"))
    val (n1, n2) = (col("__n1").cast("double"), col("__n2").cast("double"))
    val num = n2 * a - n1 * b
    j.crossJoin(broadcast(tot))
      .select(col("token"), col("c1"), col("c2"),
        ((num * num) / ((n1 * n2) * (a + b))).as("chi2"))
  }

  /** Heaps-law vocabulary-growth curve: per block (language), documents
    * are consumed in `idCol` order and the curve reports, at each of
    * `slices` equal-document checkpoints, how many tokens have been read
    * and how many DISTINCT tokens have been seen — the V(N) ≈ K·N^β curve
    * that sizes tokenizer vocabularies and detects synthetic/templated
    * corpora (β collapses when text repeats).
    *
    * Cumulative-distinct is the f5_cum_uniques problem at corpus scale:
    * never a running collect_set, instead each token's FIRST occurrence
    * position (min doc id per (block, token) — one aggregate over the
    * exploded stream), bucketed into slices and running-summed over the
    * |slices|-sized table. All counts are exact integers.
    *
    * Scale posture: one explode + two keyed aggregates (token firsts,
    * per-slice sums); the ntile window runs on the per-doc count table
    * (docs, not tokens), and every running-sum window runs on
    * block×slices rows. Nothing data-sized is ever sorted globally.
    *
    * Output per (block, slice 1..slices): cum_docs, cum_tokens, vocab.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  blockCol: String, slices: Int): DataFrame = {
    require(slices >= 1, "slices must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val perDoc = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
        size(tokens(col(textCol))).as("n_tok"))
    val sliced = perDoc.withColumn("slice",
        ntile(slices).over(Window.partitionBy("blk").orderBy("id")))
      .persist()
    val wRun = Window.partitionBy("blk").orderBy("slice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val docAgg = sliced.groupBy("blk", "slice")
      .agg(count(lit(1)).as("__d"), sum("n_tok").as("__t"))
      .select(col("blk"), col("slice"),
        sum(col("__d")).over(wRun).as("cum_docs"),
        sum(col("__t")).over(wRun).as("cum_tokens"))
    // A token's vocab contribution lands in the slice of its first doc.
    val firsts = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy("blk", "tok").agg(min("id").as("id"))
      .join(sliced.select("blk", "id", "slice"), Seq("blk", "id"))
      .groupBy("blk", "slice").agg(count(lit(1)).as("__new"))
    docAgg.join(firsts, Seq("blk", "slice"), "left")
      .withColumn("vocab",
        sum(coalesce(col("__new"), lit(0L))).over(wRun))
      .select("blk", "slice", "cum_docs", "cum_tokens", "vocab")
  }

  /** RAKE-style keyword scoring (Rose et al. 2010): candidate phrases
    * are the maximal stopword-free token runs, and a word's score is
    * its DEGREE (Σ length of the phrases it appears in — how much
    * multi-word context it attracts) over its FREQUENCY — the classic
    * unsupervised keyword extractor, here corpus-wide. Words that live
    * in long phrases ("distributed hash join") outrank equally-frequent
    * words that stand alone, which is exactly the signal tf-idf misses.
    * deg and freq are exact longs; score is their one IEEE division.
    *
    * Scale posture: one token explode, one per-doc running-sum window
    * (phrase segmentation = cumulative stopword count), one
    * (doc, phrase) length aggregate joined back on its own key, one
    * word-level rollup — every stage keyed, nothing quadratic, the
    * stopword set is a literal in the plan.
    *
    * Output: (w, freq, deg, score) per distinct non-stopword token.
    */
  def rakeScores(df: DataFrame, idCol: String, textCol: String,
                 stopwords: Seq[String]): DataFrame = {
    require(stopwords.nonEmpty, "rake needs a stopword set")
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).as("__id"),
      posexplode(tokens(col(textCol))).as(Seq("__pos", "w")))
    val seg = tok.withColumn("__stop",
        when(col("w").isin(stopwords: _*) || col("w") === "", 1L)
          .otherwise(0L))
      .withColumn("__phrase", sum("__stop").over(
        Window.partitionBy("__id").orderBy("__pos")))
    val content = seg.filter(col("__stop") === 0)
    val ph = content.groupBy("__id", "__phrase")
      .agg(count(lit(1)).as("__plen"))
    content.join(ph, Seq("__id", "__phrase"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("__plen").as("deg"))
      .withColumn("score",
        col("deg").cast("double") / col("freq").cast("double"))
  }

  /** T5-style SPAN-CORRUPTION mask statistics: deterministic span
    * starts (first md5 nibble of "docId:pos" = '0' → 1/16 start rate),
    * each start masking `spanLen` consecutive tokens (overlapping
    * spans merge) — the denoising-objective preparation step, with the
    * per-document coverage report a data pipeline validates BEFORE
    * feeding the masked corpus to training. Hash-seeded, so the mask
    * is a pure function of (doc, position): re-runs, repartitions and
    * engines agree bit-for-bit — which a RNG-driven masker cannot do.
    *
    * Scale posture: one token explode, one per-doc rolling-max window
    * (span membership = any start within the trailing spanLen window),
    * one per-doc aggregate. Output: (id, n_tokens, n_spans, n_masked,
    * mask_frac); n_spans counts starts (merged overlaps keep both).
    */
  def spanMaskStats(df: DataFrame, idCol: String, textCol: String,
                    spanLen: Int = 3): DataFrame = {
    require(spanLen >= 1, "spanLen must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
    val start = when(substring(md5(concat(col("id").cast("string"),
      lit(":"), col("pos").cast("string"))), 1, 1) === "0", 1L)
      .otherwise(0L)
    val wSpan = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(-(spanLen - 1), 0)
    tok.withColumn("__s", start)
      .withColumn("__mk", max("__s").over(wSpan))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("__s").as("n_spans"),
        sum("__mk").as("n_masked"))
      .withColumn("mask_frac",
        col("n_masked").cast("double") / col("n_tokens").cast("double"))
  }

  /** Zipf rank–frequency profile of the corpus vocabulary: the top-k
    * tokens with their frequency rank and the product cnt·rank, which
    * Zipf's law predicts is roughly constant — the one-glance check of
    * whether a corpus has natural-language token statistics (boilerplate
    * floods, template spam and synthetic filler all bend the curve).
    * Companion to the Heaps-law vocabulary-growth gate: Heaps watches
    * vocabulary vs corpus size, this watches the frequency head. Rank
    * ties break lexicographically so the profile is total-ordered and
    * engine-reproducible; cnt·rank is exact long arithmetic.
    *
    * Scale posture: one token-count aggregate; the rank window orders
    * the VOCABULARY table (not the corpus), and only the head survives.
    */
  def zipfProfile(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("cnt"), col("w"))))
      .filter(col("rank") <= topK)
      .select(col("rank"), col("w"), col("cnt"),
        (col("cnt") * col("rank")).as("cr"))
  }

  /** DSIR importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): rank raw-corpus
    * documents by how much their hashed n-gram feature distribution
    * resembles a target domain. Features are bigrams hashed into
    * 16^hexDigits buckets via the [[hashFeatures]] md5 trick (bucketing
    * is a codegen projection — no vocabulary join, the property that
    * makes this the 100 TB feature extractor). A bucket's importance
    * ratio is the add-one-smoothed target/raw probability ratio
    *
    *   r(b) = ((t_b+1)/(T+B)) · ((R+B)/(r_b+1))
    *
    * computed as two exact-long divisions and one multiply — a fixed
    * three-op IEEE tree, engine-identical. (DSIR proper sums LOG
    * ratios; ln() is libm-dependent and breaks cross-engine
    * bit-equality, so this scores by the MEAN ratio of the doc's
    * feature occurrences instead — an intentional gate-exact
    * approximation of DSIR's importance weight, NOT a rank-equivalent
    * transform of it: arithmetic-mean-of-ratios and mean-of-log-ratios
    * order differently in general. It preserves the selection INTENT —
    * docs whose features skew toward the target score high — with a
    * different tail ordering.) The per-doc mean accumulates on the
    * fixed-point 1e-6 grid (floor(r·1e6) summed as exact decimals), the
    * [[bigramLmScore]] discipline. Each division's operands stay exact
    * up to 2^53 ≈ 9e15 occurrences; beyond that pre-aggregate per shard
    * and rescale, as in [[tokenDrift]].
    *
    * Scale posture: two bucket hash-aggregates (map-side partials over
    * the explodes — the only corpus-sized work); the model is a
    * B-row table broadcast into the scoring join; totals ride a one-row
    * broadcast. The raw corpus is re-scanned once for scoring and never
    * shuffled except the per-doc groupBy.
    *
    * Output: (idCol, n_feats, score); docs with < 2 tokens have no
    * bigrams and are dropped (length-filter upstream is the curation
    * contract for fragments, as in [[repetitionStats]]).
    */
  def dsirScores(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, hexDigits: Int = 2): DataFrame = {
    // hexDigits ≤ 5 (~1M buckets): the model is broadcast into the
    // scoring join and its totals ride unpartitioned windows — both fine
    // for a ≤16^5-row table, both scale-killers at 16^8 = 4.3B rows. A
    // bucket space past ~1M needs a partitioned-total formulation (and
    // buys nothing: DSIR's published setup uses 10^4-10^5 hash buckets).
    require(hexDigits >= 1 && hexDigits <= 5, "hexDigits in [1,5]")
    val b = math.pow(16, hexDigits).toLong
    def buckets(df: DataFrame, cols: Column*) = Par.spread(df)
      .select(cols :+ explode(shingles(tokens(col(textCol)), 2)).as("__bg"): _*)
      .select(cols :+ substring(md5(col("__bg")), 1, hexDigits).as("bucket"): _*)
    val rawB = buckets(raw, col(idCol))
    val rc = rawB.groupBy("bucket").agg(count(lit(1)).as("rc"))
    val tc = buckets(target).groupBy("bucket").agg(count(lit(1)).as("tc"))
    // Corpus totals as unpartitioned windows over the B-row model table —
    // NOT fresh aggregates, which would re-run the corpus-sized bucket
    // pass once per total (plan-audited: the crossJoin(agg) form cost two
    // extra full corpus scans). B ≤ 16^5 rows in one partition is free.
    // The join is FULL OUTER so T counts every target bucket even when
    // the raw corpus never produced it — the canonical DSIR setup scores
    // a crawl against a DISJOINT reference corpus (e.g. Wikipedia), where
    // target-only buckets are common; a left join would silently shrink
    // T there. (Target-only model rows never match a raw occurrence in
    // the scoring join, so they contribute only their mass in T.)
    import org.apache.spark.sql.expressions.Window
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val model = rc.join(tc, Seq("bucket"), "outer")
      .withColumn("__R", coalesce(sum("rc").over(w), lit(0L)))
      .withColumn("__T", coalesce(sum("tc").over(w), lit(0L)))
      .select(col("bucket"),
        (((coalesce(col("tc"), lit(0L)) + 1).cast("double") /
            (col("__T") + b).cast("double")) *
          ((col("__R") + b).cast("double") /
            (coalesce(col("rc"), lit(0L)) + 1).cast("double"))).as("ratio"))
    rawB.join(broadcast(model), "bucket")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"),
        sum(floor(col("ratio") * lit(1e6)).cast("decimal(38,0)")).as("__s"))
      .select(col(idCol), col("n_feats"),
        (col("__s").cast("double") / lit(1e6) /
          col("n_feats").cast("double")).as("score"))
  }

  /** The selection half of DSIR: rank the raw corpus by [[dsirScores]]
    * and keep the top `keepFrac`, reporting per-source acceptance — the
    * number that shows HOW the kept mixture shifts toward the target
    * domain (the whole point of importance resampling). Selection is a
    * deterministic global rank under the total order (score desc, id);
    * at 100 TB use [[dsirSelectThreshold]] — the same contract with the
    * rank replaced by a score threshold from a sampled quantile, no
    * global sort. Docs with < 2 tokens never score and are
    * counted as rejected, which is the curation intent for fragments.
    *
    * Output per source: (source, n_docs, n_kept, keep_frac).
    */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, sourceCol: String,
                 keepFrac: Double, hexDigits: Int = 2): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, "keepFrac in (0,1]")
    import org.apache.spark.sql.expressions.Window
    val scored = dsirScores(raw, target, idCol, textCol, hexDigits)
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("score"), col(idCol))))
    val kept = scored
      .withColumn("n", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .filter(col("rn") <= floor(col("n") * lit(keepFrac)))
      .select(col(idCol), lit(1L).as("__keep"))
    raw.select(col(idCol), col(sourceCol).as("source"))
      .join(kept, Seq(idCol), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("__keep"), lit(0L)).as("n_kept"))
      .withColumn("keep_frac",
        col("n_kept").cast("double") / col("n_docs").cast("double"))
  }

  /** The 100 TB form of [[dsirSelect]]: selection by a score THRESHOLD
    * estimated from a deterministic hash-sample, never a global rank.
    * [[dsirSelect]]'s exact form ranks the whole corpus under one
    * unpartitioned `row_number` — a global sort, the named scale-killer.
    * Here the only ordered structure is over the SAMPLE
    * ([[Sample.bernoulliPortable]] on the id at `sampleHexCeil`/256 —
    * engine-portable, re-derivable from the id alone): the keepFrac
    * quantile of the sampled scores becomes the corpus-wide cut, rides a
    * one-row broadcast, and selection is a scalar compare inside the
    * corpus scan. At 100 TB the sample rate drops to ~1e-4 and the
    * machinery is unchanged — sample-sized sort, one-row broadcast,
    * full-parallel filter.
    *
    * Contract vs the exact form: the kept COUNT is keepFrac·n only up to
    * sampling error, and docs tied exactly at the threshold score are all
    * kept (`score >= t` — deterministic, engine-exact on the gate-exact
    * scores). When the sample is too small to place the quantile
    * (⌊m·keepFrac⌋ = 0) nothing is kept — the conservative failure mode —
    * and the report SAYS so: `n_sample` (sampled docs that scored) and
    * `has_threshold` ride every output row, so a silently-empty kept set
    * is a visible `has_threshold = false` next to its sample size instead
    * of a zero a reader has to diagnose (ADVICE r9 / VERDICT "what's
    * wrong" #3).
    *
    * Output per source: (source, n_docs, n_kept, keep_frac, n_sample,
    * has_threshold) — the [[dsirSelect]] report shape plus the sampling
    * observability columns.
    */
  def dsirSelectThreshold(raw: DataFrame, target: DataFrame, idCol: String,
                          textCol: String, sourceCol: String,
                          keepFrac: Double, hexDigits: Int = 2,
                          sampleHexCeil: String = "40"): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, "keepFrac in (0,1]")
    import org.apache.spark.sql.expressions.Window
    // The scored subtree is consumed by the sampled-quantile threshold
    // AND the corpus keep-filter, but deliberately NOT persisted
    // (contrast lmScoreBucketsThreshold, where persisting the scored
    // table won a measured 8.1→4.3 s): the sample filter on idCol pushes
    // below the scoring join to the raw scan, so the threshold branch
    // scores only the sampled fraction, while a persist forces a
    // full-corpus materialization to serve that fractional read. The
    // r15 interleaved re-probe (DsirPersistProbe, VERDICT r14 #8 — the
    // old sequential sf1 numbers 5.85 vs 4.15 did not survive it) finds
    // the persist EQUAL-OR-SLIGHTLY-FASTER at bench scales (sf0.1
    // medians 3.20 vs 3.07, sf1 6.58 vs 5.93) because the local sample
    // rate is 25% — re-scoring it nearly prices a persist's write. The
    // non-persist still ships: at 100 TB the sample rate is ~1e-4 (the
    // re-scored fraction vanishes) while the persist pins a CORPUS-sized
    // scored table in storage memory — the same liability the curation
    // stage-pin experiment rejected (OPTIMIZATION_r14 §3.1). The
    // rc/model and keep branches share the unfiltered rawB exchange via
    // ReuseExchange (stage-probe data in PLANS.md round-10).
    val scored = dsirScores(raw, target, idCol, textCol, hexDigits)
    val samp = scored.filter(Sample.bernoulliPortable(idCol, sampleHexCeil))
    // Quantile by exact rank WITHIN THE SAMPLE (sample-sized sort): the
    // threshold is the score at rank ⌊m·keepFrac⌋ under (score desc, id).
    // One aggregate row ALWAYS exists (threshold null when unplaceable),
    // so the same broadcast row feeds both the corpus-scan compare and
    // the report's observability columns — the ranked subtree runs once.
    val thr = samp
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("score"), col(idCol))))
      .withColumn("m", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .agg(max(when(col("rn") === floor(col("m") * lit(keepFrac)),
          col("score"))).as("__thr"),
        count(lit(1)).as("n_sample"))
    val kept = scored.crossJoin(broadcast(thr))
      // score >= NULL is never true: an unplaceable threshold keeps
      // nothing, per the conservative contract above.
      .filter(col("score") >= col("__thr"))
      .select(col(idCol), lit(1L).as("__keep"))
    raw.select(col(idCol), col(sourceCol).as("source"))
      .join(kept, Seq(idCol), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("__keep"), lit(0L)).as("n_kept"))
      .withColumn("keep_frac",
        col("n_kept").cast("double") / col("n_docs").cast("double"))
      .crossJoin(broadcast(thr))
      .withColumn("has_threshold", col("__thr").isNotNull)
      .drop("__thr")
  }

  /** Stupid-backoff trigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the scheme built FOR
    * distributed corpus-scale LMs: no discounting pass, just raw counts
    * and a fixed 0.4 backoff penalty). Counts are trained on a REFERENCE
    * corpus (CCNet trains on Wikipedia, scores CommonCrawl) and each
    * corpus document is scored by the mean of its trigram occurrences'
    *
    *   S(w3|w1 w2) = c(w1w2w3)/c(w1w2)          when the trigram is seen,
    *               = 0.4 · c(w2w3)/c(w2)        backing off to the bigram,
    *               = 0.16 · c(w3)/N             then to the unigram,
    *               = 0                           for out-of-vocabulary w3
    *
    * — every branch rational in exact longs (one or two IEEE ops against
    * the double literals 0.4/0.16, engine-identical), the reason stupid
    * backoff gate-hashes where a Kneser–Ney or ln-perplexity never
    * could. The per-doc mean accumulates on the 1e-12 grid as in
    * [[bigramLmScore]].
    *
    * Scale posture: the three model tables are n-gram-TYPE-sized (built
    * by map-side-combined hash aggregates over the reference corpus,
    * which is small next to the crawl); scoring is three keyed left
    * joins of the corpus occurrence table against them — AQE broadcasts
    * the models when they fit, and nothing is ever doc × doc.
    *
    * Output: (idCol, n_trigrams, score); docs with < 3 tokens have no
    * trigrams and are dropped, per the [[repetitionStats]] contract.
    */
  def backoffLmScore(corpus: DataFrame, ref: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    def grams(df: DataFrame, n: Int, out: String, cols: Column*) =
      Par.spread(df).select(
        cols :+ explode(shingles(tokens(col(textCol)), n)).as(out): _*)
    val tri = grams(ref, 3, "tg").groupBy("tg").agg(count(lit(1)).as("c123"))
    val bi = grams(ref, 2, "bg").groupBy("bg").agg(count(lit(1)).as("cb"))
    // N rides the unigram table as an unpartitioned window (vocab-sized,
    // one partition) — a fresh agg would re-run the reference token pass,
    // and it is only consumed on the unigram-backoff branch anyway, where
    // the u3 join already delivered the row carrying it.
    val uniW = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val uni = ref.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
      .withColumn("__N", sum("cu").over(uniW))
    val occ = grams(corpus, 3, "tg", col(idCol))
      .withColumn("__p", split(col("tg"), " "))
      .select(col(idCol), col("tg"),
        concat_ws(" ", col("__p").getItem(0), col("__p").getItem(1)).as("bg12"),
        concat_ws(" ", col("__p").getItem(1), col("__p").getItem(2)).as("bg23"),
        col("__p").getItem(1).as("w2"), col("__p").getItem(2).as("w3"))
    val s = occ
      .join(tri, Seq("tg"), "left")
      .join(bi.select(col("bg").as("bg12"), col("cb").as("c12")), Seq("bg12"), "left")
      .join(bi.select(col("bg").as("bg23"), col("cb").as("c23")), Seq("bg23"), "left")
      .join(uni.select(col("w").as("w2"), col("cu").as("c2")), Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("cu").as("c3"), col("__N")),
        Seq("w3"), "left")
      .select(col(idCol),
        when(col("c123").isNotNull,
            col("c123").cast("double") / col("c12").cast("double"))
          .when(col("c23").isNotNull,
            lit(0.4) * (col("c23").cast("double") / col("c2").cast("double")))
          .when(col("c3").isNotNull,
            lit(0.16) * (col("c3").cast("double") / col("__N").cast("double")))
          .otherwise(lit(0.0)).as("s"))
    s.groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"),
        sum(floor(col("s") * lit(1e12)).cast("decimal(38,0)")).as("__s"))
      .select(col(idCol), col("n_trigrams"),
        (col("__s").cast("double") / lit(1e12) /
          col("n_trigrams").cast("double")).as("score"))
  }

  /** CCNet-style LM-score bucketing (Wenzek et al. 2019): within each
    * group (CCNet buckets per language), rank documents by their
    * [[bigramLmScore]] corpus-likelihood and cut the ranking into
    * `buckets` equal tiles — head/middle/tail at the default 3. The
    * head:middle:tail split is the standard curation lever ("train on
    * head+middle, drop tail"), gated here by the per-bucket document
    * and bigram totals plus the score range the cut landed on. Ties
    * break on idCol so the tiling is total-ordered and
    * engine-reproducible; the scores themselves are gate-exact by
    * [[bigramLmScore]] construction, so min/max hash-match.
    *
    * Scale posture: scoring is [[bigramLmScore]]'s three keyed
    * shuffles; the tiling window is PARTITIONED by the group column, so
    * each language sorts independently (the w-family contract). At
    * 100 TB use [[lmScoreBucketsThreshold]] — the exact ntile replaced
    * by threshold assignment from sampled per-group quantiles, same
    * downstream contract, no per-group full sort.
    */
  def lmScoreBuckets(df: DataFrame, idCol: String, textCol: String,
                     groupCol: String, buckets: Int = 3): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val scored = bigramLmScore(df, idCol, textCol)
      .join(df.select(col(idCol), col(groupCol)), idCol)
    val w = Window.partitionBy(groupCol)
      .orderBy(desc("avg_p"), col(idCol))
    scored.withColumn("bucket", ntile(buckets).over(w).cast("long"))
      .groupBy(groupCol, "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_bigrams").as("sum_bigrams"),
        min("avg_p").as("min_p"), max("avg_p").as("max_p"))
  }

  /** The 100 TB form of [[lmScoreBuckets]]: bucket boundaries estimated
    * per group from a deterministic hash-sample, assignment by scalar
    * compare — no per-group full sort. The exact form ntiles EVERY doc
    * inside a per-group window (each language's whole slice sorts); here
    * only the SAMPLE ([[Sample.bernoulliPortable]] on the id) is ranked,
    * per group, to read off the buckets−1 cut scores c_b (the score at
    * sample rank ⌊m·b/buckets⌋ under (score desc, id)); the cut table
    * (groups × (buckets−1) rows, pivoted to one row per group) is
    * broadcast and every doc lands in bucket 1 + #{b : score < c_b} —
    * a codegen'd compare chain inside the corpus scan.
    *
    * Contract vs the exact form: tile POPULATIONS are equal only up to
    * sampling error; docs tied exactly at a cut land in the better
    * (lower-numbered) bucket (`score >= c_b`). A group whose sample is
    * too small to place cut b (⌊m·b/buckets⌋ = 0) leaves that cut
    * unplaced, and the missing comparison keeps docs in lower buckets —
    * the conservative failure mode. Scores are gate-exact by
    * [[bigramLmScore]] construction, so the compare is engine-exact.
    *
    * Output: (groupCol, bucket, n_docs, sum_bigrams, min_p, max_p) — the
    * [[lmScoreBuckets]] report shape, comparable side by side.
    */
  def lmScoreBucketsThreshold(df: DataFrame, idCol: String, textCol: String,
                              groupCol: String, buckets: Int = 3,
                              sampleHexCeil: String = "80",
                              materialize: Boolean = true): DataFrame =
    lmScoreBucketsThresholdManaged(df, idCol, textCol, groupCol, buckets,
      sampleHexCeil, materialize)._1

  /** [[lmScoreBucketsThreshold]] with the persist lifecycle surfaced at
    * the API (ADVICE r10): the second element unpersists the scored
    * table once the returned report has been consumed. The unmanaged
    * overload leaks one MEMORY_AND_DISK table per call by design —
    * Bench/Verify scrub persistent RDDs between gates (the minHashLsh
    * contract) — so any OTHER long-lived-session caller should use this
    * form (or pass materialize=false) instead of relying on that scrub.
    */
  def lmScoreBucketsThresholdManaged(df: DataFrame, idCol: String,
                                     textCol: String, groupCol: String,
                                     buckets: Int = 3,
                                     sampleHexCeil: String = "80",
                                     materialize: Boolean = true)
      : (DataFrame, () => Unit) = {
    require(buckets >= 2, "buckets must be >= 2")
    import org.apache.spark.sql.expressions.Window
    // Score once, select twice: the cut estimation AND the bucketing
    // pass both consume the scored table; unpersisted, each re-runs the
    // LM model build + corpus scoring join (measured 8.1 -> 4.3-5.3 s at
    // sf1, PLANS.md round-10). The returned report is lazy, so the
    // persist cannot be dropped inside this function — the handle below
    // hands the unpersist to the caller.
    val scored0 = bigramLmScore(df, idCol, textCol)
      .join(df.select(col(idCol), col(groupCol)), idCol)
    val scored = if (materialize)
      scored0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else scored0
    val samp = scored.filter(Sample.bernoulliPortable(idCol, sampleHexCeil))
      .withColumn("rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(desc("avg_p"), col(idCol))))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(groupCol)))
    // One row per group carrying its cut scores: c_b = the sampled score
    // at rank floor(m*b/buckets), absent (null) when the sample cannot
    // place it. min() over the at-most-one matching row is just
    // "the value or null" — no ordering dependence.
    val cutCols = (1 until buckets).map { b =>
      min(when(col("rn") ===
        floor(col("m") * lit(b.toLong) / lit(buckets.toLong)),
        col("avg_p"))).as(s"__c$b")
    }
    val cuts = samp.groupBy(groupCol).agg(cutCols.head, cutCols.tail: _*)
    val bucketed = scored.join(broadcast(cuts), Seq(groupCol), "left")
      .withColumn("bucket",
        (1 until buckets).foldLeft(lit(1L)) { (acc, b) =>
          acc + when(col("avg_p") < col(s"__c$b"), 1L).otherwise(0L)
        })
    val report = bucketed.groupBy(groupCol, "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_bigrams").as("sum_bigrams"),
        min("avg_p").as("min_p"), max("avg_p").as("max_p"))
    (report, () => { if (materialize) scored.unpersist(); () })
  }
}
