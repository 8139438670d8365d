package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(sf("documents"))

  test("exactKeepFirst is deterministic and idempotent") {
    val df = Seq(
      (1L, "k1"), (2L, "k1"), (3L, "k2"), (4L, "k1"), (5L, "k2"))
      .toDF("id", "key")
    val once = Dedup.exactKeepFirst(df, Seq("key"), "id")
    assert(once.orderBy("id").as[(Long, String)].collect()
      .toSeq == Seq((1L, "k1"), (3L, "k2")))
    val twice = Dedup.exactKeepFirst(once, Seq("key"), "id")
    assert(twice.orderBy("id").collect().sameElements(once.orderBy("id").collect()))
  }

  test("jaccardPairs: identical docs score 1.0, disjoint docs are absent") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 w5"),
      (3L, "z1 z2 z3 z4 z5")).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
  }

  test("jaccard is bounded in (0,1] and pairs are ordered da < db") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.05)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, j) => a < b && j > 0.0 && j <= 1.0 })
  }

  test("minHashLsh candidates are a subset of exact jaccard pairs (fast hash)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text", 3, k = 8, bands = 4,
        threshold = 0.8) // xxhash64 path
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    // high-similarity pairs should mostly survive banding at b=4,r=2
    assert(lsh.nonEmpty)
  }

  test("lshAudit scorecard equals the independent minHashLsh + jaccardPairs composition") {
    // The audit shares ONE shingle materialization between its surfaced
    // and truth branches; this proves the sharing changes no number.
    for ((k, bands) <- Seq((8, 4), (16, 4))) {
      val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
        .select("da", "db").as[(Long, Long)].collect().toSet
      val surfaced = Dedup.minHashLsh(docs, "doc_id", "text", 3, k = k,
          bands = bands, threshold = 0.8)
        .select("da", "db").as[(Long, Long)].collect().toSet
      val row = Dedup.lshAudit(docs, "doc_id", "text", 3, k = k,
        bands = bands, threshold = 0.8).collect().head
      assert(row.getLong(0) == exact.size.toLong, s"n_exact (k=$k)")
      assert(row.getLong(1) == (surfaced -- exact).size.toLong,
        s"n_extra (k=$k)")
      assert(row.getLong(2) == (surfaced & exact).size.toLong,
        s"n_hit (k=$k)")
      assert(row.getLong(1) == 0L, "surfaced must verify-subset into truth")
    }
  }

  test("prefix-filtered jaccardPairs equals brute-force all-pairs exactly") {
    // PPJoin prefix filtering must be a pure optimization: same pairs,
    // same (bit-identical) scores as scoring every pair of shingle sets.
    val sets = docs
      .select($"doc_id", explode(TextOps.shingles(TextOps.tokens($"text"), 3))
        .as("sh"))
      .distinct()
      .as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val naive = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = sets(ids(i)); b = sets(ids(j))
      ni = (a & b).size
      jacc = ni.toDouble / (a.size + b.size - ni).toDouble
      if jacc >= 0.8
    } yield (ids(i), ids(j), jacc)).toSet
    val got = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8,
        prefixFilter = true)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == naive)
    // and the default full-self-join path agrees bit-for-bit
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(full == naive)
    assert(naive.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("carried-size scoring equals cnt-join scoring bit-for-bit") {
    // r15: the default (length-filtered) path scores from the sizes the
    // self-join window already carried (scorePairsCarried); a huge
    // maxDocFreq forces the same candidate set through the explicit
    // pairIntersections + cnt-join scoring path (scorePairs). Same exact
    // integers, same one double division — the outputs must be identical.
    val carried = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val joined = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8,
        maxDocFreq = Long.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    assert(carried == joined)
    assert(carried.nonEmpty)
  }

  test("maxDocFreq cut never invents pairs") {
    val all = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val cut = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8, maxDocFreq = 50)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(cut.subsetOf(all))
  }

  test("editDistancePairs: bounded-threshold DP equals the unbounded form " +
      "on both polarities") {
    // Near pair (distance 2 over the 20-char prefix, well under maxDist),
    // far pair sharing a candidate shingle (distance above maxDist — must
    // be dropped, and the bounded form's -1 sentinel must never leak), and
    // an unrelated doc (no shared shingle — never a candidate).
    val df = Seq(
      (1L, "aa bb cc dd ee ff gg"),
      (2L, "aa bb cc dd ee ff gx"),
      (3L, "aa bb cc zz yy xx wv uu tt ss rr qq pp"),
      (4L, "q1 q2 q3 q4 q5 q6 q7")).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(df, "doc_id", "text",
        n = 3, prefixLen = 20, maxDist = 4)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    // Reference: unbounded levenshtein over the same candidates.
    val pre = df.select(col("doc_id"), substring(col("text"), 1, 20).as("p"))
    val ref = pre.as("a").join(pre.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.p"), col("b.p")).as("d"))
      .filter(col("d") <= 4)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got.nonEmpty && got.forall(_._3 >= 0))
    // got ⊆ ref (candidates are shingle-blocked, ref is all-pairs) and
    // every kept distance matches the unbounded value exactly.
    assert(got.toSet.subsetOf(ref.toSet))
    assert(got.map { case (a, b, _) => (a, b) }.contains((1L, 2L)))
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 3L) })
  }

  test("simhashPairs: banded candidates reproduce all-pairs Hamming exactly") {
    val d = docs.filter($"doc_id" < 100)
    val got = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3)
      .select("da", "db", "hamming").as[(Long, Long, Int)].collect().toSet
    // brute force: all pairs over the signatures, no banding
    val sigs = Dedup.simhash(d, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = sigs(a).zip(sigs(b)).count { case (x, y) => x != y }
      if h <= 3
    } yield (a, b, h)).toSet
    assert(got == want, "pigeonhole blocking must be lossless for h <= 3")
    assert(got.nonEmpty)
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 4)
    }
  }

  test("sparseCosinePairs: exact count-vector cosine; df cut prunes the space") {
    val df = Seq(
      (1L, "a a b"),   // tf: a=2, b=1, |v|² = 5
      (2L, "a b b"),   // tf: a=1, b=2, |v|² = 5
      (3L, "c"))       // shares nothing
      .toDF("id", "text")
    // The unbounded unigram mode is the declared-quadratic path and must
    // be requested explicitly — the default contract requires a bound.
    intercept[IllegalArgumentException] {
      Dedup.sparseCosinePairs(df, "id", "text", threshold = 0.5)
    }
    val out = Dedup.sparseCosinePairs(df, "id", "text", threshold = 0.5,
        allowUnigramDebug = true)
      .as[(Long, Long, Double)].collect()
    // only (1,2): num = 2*1 + 1*2 = 4; the expression shape (one division
    // by a product of sqrts) must reproduce bit-exactly
    val want = 4.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(out.toSeq == Seq((1L, 2L, want)))
    // identical docs score exactly 1? no — sqrt(n)² != n in FP; assert the
    // defined expression instead of an idealized constant
    val self = Dedup.sparseCosinePairs(
        Seq((1L, "x y"), (2L, "x y")).toDF("id", "text"), "id", "text", 0.9,
        allowUnigramDebug = true)
      .as[(Long, Long, Double)].collect()
    assert(self.map(r => (r._1, r._2)).toSeq == Seq((1L, 2L)))
    assert(math.abs(self.head._3 - 1.0) < 1e-12)
    // maxDocFreq = 1 removes every token with df 2 from the space: docs
    // 1 and 2 vanish (empty vectors), so no pairs survive
    val pruned = Dedup.sparseCosinePairs(df, "id", "text",
      threshold = 0.0, maxDocFreq = 1L)
    assert(pruned.count() == 0)
    // frequency sensitivity: Jaccard can't tell these apart, cosine can
    val freq = Seq((1L, "a b"), (2L, "a a a a b")).toDF("id", "text")
    val sim = Dedup.sparseCosinePairs(freq, "id", "text", 0.0,
        allowUnigramDebug = true)
      .as[(Long, Long, Double)].head()._3
    assert(sim < 1.0 && sim > 0.5, s"skewed frequencies must lower sim: $sim")
  }

  test("sparseCosinePairs shingleN: vector space is n-word shingle counts") {
    val df = Seq(
      (1L, "p q r s t"),    // 2-shingles: pq qr rs st
      (2L, "p q r s u"),    // shares pq qr rs (3 of 4)
      (3L, "z p z q z r"))  // shares unigrams p q r, but no 2-shingle
      .toDF("id", "text")
    val out = Dedup.sparseCosinePairs(df, "id", "text",
        threshold = 0.5, shingleN = 2)
      .as[(Long, Long, Double)].collect().toSeq
    // doc 3 overlaps 1/2 in the unigram space but is orthogonal in the
    // shingle space — only (1,2) survives
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 2L)))
    val want = 3.0 / (math.sqrt(4.0) * math.sqrt(4.0))
    assert(out.head._3 == want)
    // docs shorter than n tokens have empty vectors and never pair
    val short = Seq((1L, "a"), (2L, "a")).toDF("id", "text")
    assert(Dedup.sparseCosinePairs(short, "id", "text", 0.0,
      shingleN = 2).count() == 0)
  }

  test("resolveClusters: min-id propagates across chains, singletons stay") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // chain 1-2-3 (no direct 1-3 edge) plus island 5-6; 4 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("da", "db")
    val got = Dedup.resolveClusters(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("resolveClusters: star contraction converges a 200-node chain in O(log n) rounds") {
    // plain label propagation would need 199 rounds — far over maxRounds=10
    val n = 200
    val docs = (1 to n).map(_.toLong).toDF("doc_id")
    val pairs = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("da", "db")
    val got = Dedup.resolveClusters(docs, "doc_id", pairs, maxRounds = 10)
      .as[(Long, Long)].collect()
    assert(got.length == n && got.forall(_._2 == 1L))
  }

  test("dedupByClusters keeps exactly one canonical doc per cluster") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("da", "db")
    val labels = Dedup.resolveClusters(df, "doc_id", pairs)
    val kept = Dedup.dedupByClusters(df, "doc_id", labels)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("incrementalNearDup: cross-set near-dups only, never corpus pairs") {
    val newB = Seq(
      (100L, "aa bb cc dd ee ff gg hh"),   // near-dup of corpus doc 1
      (101L, "zz yy xx ww vv uu tt ss"))   // novel
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "aa bb cc dd ee ff gg qq"),     // corpus-internal near-dup of 1
      (3L, "mm nn oo pp qq rr ss tt"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDup(newB, corpus, "doc_id", "text",
        n = 2, k = 16, bands = 4, threshold = 0.7)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got.contains((100L, 1L)), "exact duplicate must collide and verify")
    assert(got.forall { case (n2, c) => n2 >= 100L && c < 100L },
      "only cross-set pairs — never corpus-internal")
    assert(!got.exists(_._1 == 101L), "novel doc has no near-dup")
  }

  test("dedupByClustersBest keeps the highest-score doc, min-id tiebreak") {
    val df = Seq(
      (1L, "a", 5L), (2L, "a", 9L), (3L, "a", 9L),  // cluster {1,2,3}: 2 wins (9, min id)
      (4L, "b", 1L))                                 // singleton survives
      .toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("da", "db")
    val labels = Dedup.resolveClusters(df, "doc_id", pairs)
    val kept = Dedup.dedupByClustersBest(df, "doc_id", "score", labels)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
    // cluster count preserved: one survivor per cluster
    assert(kept.size ==
      labels.select("cluster").distinct().count())
  }

  test("resolveClusters on the corpus: clusters match pair connectivity") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
    val labels = Dedup.resolveClusters(docs, "doc_id", pairs)
    // every pair is in one cluster
    val viol = pairs.join(labels.withColumnRenamed("id", "da")
        .withColumnRenamed("cluster", "ca"), "da")
      .join(labels.withColumnRenamed("id", "db")
        .withColumnRenamed("cluster", "cb"), "db")
      .filter($"ca" =!= $"cb").count()
    assert(viol == 0)
    // cluster ids are members of their own cluster (min-id canonical form)
    val bad = labels.as("l").join(labels.as("m"),
        $"l.cluster" === $"m.id", "left_anti").count()
    assert(bad == 0)
  }

  test("minHashLsh fast path: k=64 single-buffer signatures stay a candidate subset") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val k64 = Dedup.minHashLsh(docs, "doc_id", "text", 3, k = 64, bands = 16,
        threshold = 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(k64.subsetOf(exact))
    assert(k64.nonEmpty)
  }

  test("segmentDedup keeps first occurrence corpus-wide and rebuilds docs") {
    val df = Seq(
      (1L, "a b c d"),            // segs (W=2): "a b", "c d"
      (2L, "a b x y"),            // "a b" already seen -> kept "x y"
      (3L, "c d a b"))            // both seen -> empty doc
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y"),
      (3L, 2L, 0L, "")))
  }

  test("segmentDedup: last short segment kept; pos order preserved") {
    val df = Seq((1L, "a b c d e"), (2L, "z z a b c")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    // doc 1: "a b","c d","e"; doc 2: "z z","a b","c" -> drops "a b" only
    assert(out == Seq((1L, 3L, 3L, "a b c d e"), (2L, 3L, 2L, "z z c")))
  }

  test("incrementalDedup: only content-new rows of the batch survive") {
    val corpus = Seq((10L, "seen text"), (11L, "other text")).toDF("doc_id", "text")
    val batch = Seq((1L, "seen text"), (2L, "fresh text"), (3L, "other text"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(batch, corpus, "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(2L))
  }

  test("resolveClusters rejects non-integral id columns loudly") {
    val df = Seq(("a", "t")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("da", "db")
    val e = intercept[IllegalArgumentException] {
      Dedup.resolveClusters(df, "doc_id", pairs)
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("cdcChunkDedup: identity on unique docs, full dedup of copies, " +
    "shift-robust against a prefix insertion") {
    val a = "the quick brown fox jumps over the lazy dog near a riverbank " +
      "while seventeen violet machines hum quietly beneath ancient stars"
    val df = Seq((1L, a), (2L, a), (3L, s"zzz $a")).toDF("doc_id", "text")
    val out = Dedup.cdcChunkDedup(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val (d1, d2, d3) = (out(0), out(1), out(2))
    // unique doc reconstructs exactly
    assert(d1._4 == a && d1._2 == d1._3)
    // exact copy dedups completely
    assert(d2._3 == 0L && d2._4 == "")
    // prefix insertion only disturbs the first chunk: the unchanged tail
    // still dedups against doc 1 (fixed segments would keep everything)
    assert(d3._3 <= 2L, s"shifted copy kept ${d3._3} of ${d3._2} chunks")
  }

  test("contaminationBloom: upper-bounds exact hits, never misses one") {
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val exact = Dedup.contamination(train, bench, "doc_id", "text", 3)
      .select(col("doc_id"), col("n_sh"), col("n_hit"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val bloom = Dedup.contaminationBloom(train, bench, "doc_id", "text", 3,
        expectedItems = 100000L, fpp = 0.01)
      .select(col("doc_id"), col("n_sh"), col("n_hit_ub"))
      .as[(Long, Long, Long)].collect()
    assert(bloom.nonEmpty && bloom.length == exact.size)
    bloom.foreach { case (id, nSh, ub) =>
      val (exSh, exHit) = exact(id)
      assert(nSh == exSh)
      assert(ub >= exHit, s"false negative for doc $id: $ub < $exHit")
    }
    // False-positive mass stays near the configured fpp (generous 10x cap
    // to keep the assertion robust on a small corpus).
    val extra = bloom.map { case (id, _, ub) => ub - exact(id)._2 }.sum.toDouble
    val total = bloom.map(_._2).sum.toDouble
    assert(extra / total <= 0.1, s"fp mass ${extra / total}")
  }

  test("bloom_agg / bloom_might_contain work from the SQL surface") {
    spark.range(1000).createOrReplaceTempView("bf_build")
    val bf = spark.sql("""
      SELECT bloom_agg(xxhash64(CAST(id AS STRING)),
                       CAST(1000 AS BIGINT), CAST(16384 AS BIGINT)) AS bf
      FROM bf_build""").head.getAs[Array[Byte]]("bf")
    spark.catalog.dropTempView("bf_build")
    val probes = spark.range(2000).selectExpr("CAST(id AS STRING) AS s")
    probes.createOrReplaceTempView("bf_probe")
    val hits = spark.sql("""
      SELECT count(*) AS n FROM bf_probe
      WHERE bloom_might_contain(x'%s', xxhash64(s))"""
        .format(bf.map("%02x".format(_)).mkString))
      .head.getLong(0)
    spark.catalog.dropTempView("bf_probe")
    // all 1000 members must hit; false positives bounded well under the
    // extra 1000 non-members
    assert(hits >= 1000 && hits < 1100, s"hits=$hits")
  }

  test("containmentPairs: embedded doc is contained, container is not") {
    // doc 2 is a verbatim prefix of doc 1 plus nothing else; doc 1 has a
    // long unique tail — containment(2 in 1) ~ 1, containment(1 in 2) low.
    val core = (1 to 12).map(i => s"c$i").mkString(" ")
    val tail = (1 to 40).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, core + " " + tail),
      (2L, core),
      (3L, (1 to 30).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(df, "doc_id", "text",
        k = 3, w = 4, minNum = 7, minDen = 10, maxDocFreq = 10)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(rows.contains((2L, 1L)), s"missing (2,1) in $rows")
    assert(rows((2L, 1L)) >= 0.7)
    assert(!rows.contains((1L, 2L)), "container must not be 'contained'")
    assert(rows.keys.forall { case (a, b) => a != 3L && b != 3L })
  }

  test("containmentPairs drops boilerplate fingerprints on both sides") {
    // A fingerprint present in every doc (shared boilerplate) must not
    // drive containment: with maxDocFreq=1 nothing is shared, so no pairs.
    val boiler = (1 to 15).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, boiler + " x1 x2 x3"),
      (2L, boiler + " y1 y2 y3")).toDF("doc_id", "text")
    val none = Dedup.containmentPairs(df, "doc_id", "text",
        k = 3, w = 4, minNum = 1, minDen = 10, maxDocFreq = 1)
    assert(none.isEmpty)
  }

  test("lshRecall: identical docs always collide — recall 1.0; counts consistent") {
    // Truth = the one identical pair (jacc 1.0); identical shingle sets give
    // identical signatures, so banding must surface it in every band.
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val r = Dedup.lshRecall(df, "doc_id", "text",
        n = 3, k = 8, bands = 2, threshold = 0.8, portable = true)
      .as[(Long, Long, Long, Double)].collect().head
    assert(r._1 == 1L && r._3 == 1L && r._4 == 1.0)
    assert(r._3 <= math.min(r._1, r._2))
  }

  test("simhash emits 16-bit strings and groups identical docs together") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "one two three four")).toDF("doc_id", "text")
    val rows = Dedup.simhash(df, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(rows.values.forall(h => h.length == 16 && h.forall("01".contains(_))))
    assert(rows(1L) == rows(2L))
  }

  test("sortedNeighborhoodPairs: adjacent near-dups found, out-of-window missed") {
    // Sorted by 8-char prefix: d1 "aaaa..." / d2 "aaab..." adjacent and
    // near-identical -> verified pair. d4 "zzzz..." shares d1's shingles
    // (a near-dup whose first token changed) but sorts 3 positions away
    // with window=1 -> missed, the method's documented lossiness. d3 sits
    // between as an unrelated separator.
    val df = Seq(
      (1L, "aaaa one two three four five six"),
      (2L, "aaab one two three four five six"),
      (3L, "mmmm unrelated filler words here now"),
      (4L, "zzzz one two three four five six")).toDF("doc_id", "text")
    val one = df.withColumn("blk", lit(1))
    val out = Dedup.sortedNeighborhoodPairs(one, "doc_id", "text",
        "blk", window = 1, keyLen = 4, n = 3, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(out.map(p => (p._1, p._2)) == Set((1L, 2L)))
    // 4 shared of 5 3-shingles each (the first shingle differs): 4/6.
    assert(out.head._3 == 4.0 / 6.0)
    // Widening the window to 3 recovers the prefix-divergent pair.
    val wide = Dedup.sortedNeighborhoodPairs(one, "doc_id", "text",
        "blk", window = 3, keyLen = 4, n = 3, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(wide.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("sortedNeighborhoodPairs: blocks never pair across; repartition-stable") {
    val df = Seq(
      (1L, "en", "common text body one two three"),
      (2L, "en", "common text body one two three"),
      (3L, "fr", "common text body one two three"))
      .toDF("doc_id", "lang", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.sortedNeighborhoodPairs(d, "doc_id", "text", "lang",
        window = 4, keyLen = 8, n = 3, threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSet
    val out = run(df)
    assert(out.map(p => (p._1, p._2)) == Set((1L, 2L)))
    assert(out == run(df.repartition(7)))
  }

  test("snmRecall: counts truth vs surfaced pairs; window widening raises recall") {
    val df = Seq(
      (1L, "g", "aaaa one two three four five six"),
      (2L, "g", "aaab one two three four five six"),
      (3L, "g", "mmmm unrelated filler words here now"),
      (4L, "g", "zzzz one two three four five six"))
      .toDF("doc_id", "lang", "text")
    // Truth at 0.3: (1,2), (1,4), (2,4). Window 1 finds only (1,2).
    val narrow = Dedup.snmRecall(df, "doc_id", "text", "lang",
        window = 1, keyLen = 4, n = 3, threshold = 0.3)
      .as[(Long, Long, Option[Double])].head()
    assert(narrow == ((3L, 1L, Some(1.0 / 3.0))))
    val wide = Dedup.snmRecall(df, "doc_id", "text", "lang",
        window = 3, keyLen = 4, n = 3, threshold = 0.3)
      .as[(Long, Long, Option[Double])].head()
    assert(wide == ((3L, 3L, Some(1.0))))
  }

  test("fieldMatchPairs: weighted agreement, blocking, nulls carry no weight") {
    val df = Seq(
      (1L, "b1", Some("x"), 10L), (2L, "b1", Some("x"), 10L),
      (3L, "b1", Some("y"), 10L), (4L, "b2", Some("x"), 10L),
      (5L, "b1", None: Option[String], 10L),
      (6L, "b1", None: Option[String], 10L))
      .toDF("id", "blk", "f1", "f2")
    val out = Dedup.fieldMatchPairs(df, "id", "blk",
        Seq(col("f1") -> 3L, col("f2") -> 2L), minScore = 5L)
      .as[(Long, Long, Long)].collect().toSet
    // (1,2): both fields agree -> 5. (1,3)/(2,3): only f2 -> 2, dropped.
    // 4 is in another block. (5,6): f1 missing on both sides — a missing
    // value is zero evidence (Fellegi–Sunter), so only f2's 2 -> dropped.
    assert(out == Set((1L, 2L, 5L)))
  }

  /** Driver-side brute force: longest common token run of two docs by
    * O(n·m) diagonal scan — the ground truth substringDedup must equal.
    */
  private def bruteLongestRun(a: Seq[String], b: Seq[String]): Int = {
    var best = 0
    for (d <- -(b.length - 1) to (a.length - 1)) {
      var run = 0
      for (i <- math.max(0, d) until math.min(a.length, b.length + d)) {
        if (a(i) == b(i - d)) { run += 1; if (run > best) best = run }
        else run = 0
      }
    }
    best
  }

  test("substringDedup equals the brute-force longest common run on " +
      "every pair (boundary-straddling, repeats, multiple islands)") {
    // Crafted shapes: a copied 9-token span straddling any 8-word segment
    // boundary (docs 1/2), a doc with an internal repeat (3), two disjoint
    // shared runs (4/5 — islands on different diagonals), an exact-dup
    // pair (6/7), and an unrelated doc (8).
    val texts = Seq(
      1L -> "q w e r alpha beta gamma delta epsilon zeta eta theta iota z",
      2L -> "x alpha beta gamma delta epsilon zeta eta theta iota y u i o p",
      3L -> "m alpha beta gamma delta epsilon zeta eta theta n alpha beta gamma delta epsilon zeta eta theta k",
      4L -> "a1 a2 a3 a4 a5 a6 a7 a8 mid b1 b2 b3 b4 b5 b6 b7 b8 tail1",
      5L -> "pre a1 a2 a3 a4 a5 a6 a7 a8 gap gap2 b1 b2 b3 b4 b5 b6 b7 b8",
      6L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
      7L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
      8L -> "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 zz9 zz10")
    val df = texts.toDF("doc_id", "text")
    val got = Dedup.substringDedup(df, "doc_id", "text", minRun = 8)
      .select("da", "db", "longest_run")
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, r) => (a, b) -> r }.toMap
    val tok = texts.toMap.view.mapValues(_.split(" ").toSeq).toMap
    val want = (for {
      a <- texts.map(_._1); b <- texts.map(_._1) if a < b
      r = bruteLongestRun(tok(a), tok(b)) if r >= 8
    } yield (a, b) -> r.toLong).toMap
    assert(got == want,
      s"pairs/runs diverge from brute force:\n got=$got\n want=$want")
    // The crafted shapes actually exercised what they claim.
    assert(want((1L, 2L)) == 9L)   // straddles segment boundaries
    assert(want((4L, 5L)) == 8L)   // two disjoint 8-runs, max is 8
    assert(want((6L, 7L)) == 10L)  // exact dup
    assert(!want.contains((1L, 8L)))
    // n_anchor_matches counts every same-diagonal match: doc 3 repeats
    // its 8-token block, so vs doc 1's single block it anchors 2 islands
    // of one 8-gram each.
    val m13 = Dedup.substringDedup(df, "doc_id", "text", minRun = 8)
      .filter(col("da") === 1L && col("db") === 3L)
      .select("n_anchor_matches").as[Long].head()
    assert(m13 == 2L)
  }

  /** Driver-side brute force for [[Dedup.substringRemove]]: the b-side
    * positions covered by any maximal common run of length >= minRun,
    * by the same O(n·m) diagonal scan as [[bruteLongestRun]].
    */
  private def bruteDropped(a: Seq[String], b: Seq[String],
                           minRun: Int): Set[Int] = {
    val out = scala.collection.mutable.Set[Int]()
    for (d <- -(b.length - 1) to (a.length - 1)) {
      val end = math.min(a.length, b.length + d)
      var i = math.max(0, d)
      var runStart = -1
      var run = 0
      def flush(): Unit =
        if (run >= minRun)
          for (k <- runStart until runStart + run) out += (k - d)
      while (i < end) {
        if (a(i) == b(i - d)) { if (run == 0) runStart = i; run += 1 }
        else { flush(); run = 0 }
        i += 1
      }
      flush()
    }
    out.toSet
  }

  test("substringRemove equals brute-force first-occurrence span removal " +
      "(transitive chains, disjoint spans, whole-doc removal)") {
    // Same crafted corpus as the substringDedup brute-force spec, plus
    // doc 9 extending the 6/7 exact-dup pair into a transitive chain
    // 6 < 7 < 9 (9 must drop its copied block against BOTH, exactly
    // once per position).
    val texts = Seq(
      1L -> "q w e r alpha beta gamma delta epsilon zeta eta theta iota z",
      2L -> "x alpha beta gamma delta epsilon zeta eta theta iota y u i o p",
      3L -> "m alpha beta gamma delta epsilon zeta eta theta n alpha beta gamma delta epsilon zeta eta theta k",
      4L -> "a1 a2 a3 a4 a5 a6 a7 a8 mid b1 b2 b3 b4 b5 b6 b7 b8 tail1",
      5L -> "pre a1 a2 a3 a4 a5 a6 a7 a8 gap gap2 b1 b2 b3 b4 b5 b6 b7 b8",
      6L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
      7L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
      8L -> "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 zz9 zz10",
      9L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 extra9")
    val df = texts.toDF("doc_id", "text")
    val got = Dedup.substringRemove(df, "doc_id", "text", minRun = 8)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val tok = texts.toMap.view.mapValues(_.split(" ").toSeq).toMap
    val want = texts.map { case (b, _) =>
      val tb = tok(b)
      val dropped = texts.map(_._1).filter(_ < b)
        .flatMap(a => bruteDropped(tok(a), tb, 8)).toSet
      val kept =
        tb.indices.filterNot(dropped.contains).map(tb).mkString(" ")
      b -> ((tb.length.toLong, dropped.size.toLong, kept))
    }.toMap
    assert(got == want,
      s"removal diverges from brute force:\n got=$got\n want=$want")
    // The crafted shapes actually exercised what they claim.
    assert(want(1L)._2 == 0L)            // earliest doc keeps everything
    assert(want(2L)._2 == 9L)            // 9-token copied span dropped
    assert(want(5L)._3 == "pre gap gap2") // two disjoint spans spliced out
    assert(want(7L)._3 == "")            // whole doc was a copy
    assert(want(9L)._3 == "extra9")      // transitive chain, no double-drop
    assert(want(8L)._2 == 0L)            // unrelated doc untouched
  }

  test("substringRemove maxDf valve: viral grams removed from the pair " +
      "lattice, rare shared runs still drop") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = (1L to 5L).map(i => i -> s"$boiler unique$i tail$i") :+
      (6L -> "u1 u2 u3 u4 u5 u6 u7 u8 x") :+
      (7L -> "y u1 u2 u3 u4 u5 u6 u7 u8")
    val df = docs.toDF("doc_id", "text")
    val cut = Dedup.substringRemove(df, "doc_id", "text", minRun = 8,
        maxDf = Some(2L))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._3).toMap
    // Boilerplate grams (df=5) never enter the pair join, so docs 2-5
    // keep their boilerplate; doc 7 still drops its df-2 copied run.
    assert((1L to 6L).forall(cut(_) == 0L))
    assert(cut(7L) == 8L)
  }

  test("substringDedup maxDf drops viral grams before the pair join") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = (1L to 5L).map(i => i -> s"$boiler unique$i tail$i") :+
      (6L -> "u1 u2 u3 u4 u5 u6 u7 u8 x") :+
      (7L -> "y u1 u2 u3 u4 u5 u6 u7 u8")
    val df = docs.toDF("doc_id", "text")
    val all = Dedup.substringDedup(df, "doc_id", "text", minRun = 8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(all.size == 11) // C(5,2) boilerplate pairs + (6,7)
    val cut = Dedup.substringDedup(df, "doc_id", "text", minRun = 8,
        maxDf = Some(2L))
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(cut == Set((6L, 7L)),
      "maxDf must drop the 5-doc boilerplate gram but keep the df-2 run")
  }
}
