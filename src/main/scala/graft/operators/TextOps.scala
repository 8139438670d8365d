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
}
