package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Times the headline queries (SparkEntry.benchNames) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Methodology — each query is timed in ISOLATION, in its own forked JVM:
  * rounds 5 and 6 both produced headline "regressions" that turned out to
  * be suite-ordering artifacts (a +103% minhash ghost; k-truss recorded at
  * 2.15× its isolated median), because 30 queries sharing one JVM share
  * JIT/code-cache state, heap fragmentation, and whatever the previous
  * query leaked. A fresh JVM per query is the only state a reader can
  * reason about, and it is exactly how the isolated PLANS.md probes that
  * exposed the ghosts were run.
  *
  * Per query the child JVM runs one untimed warmup (JVM JIT + codegen +
  * parquet footer caches) then `SPARK_GRAFT_BENCH_RUNS` (default 3) timed
  * runs with a full BlockManager scrub + GC between runs. The artifact
  * records the MEDIAN (robust to a single JIT-deopt outlier, comparable
  * to the isolated 5-run medians in PLANS.md) plus a per-query `variance`
  * field — relative spread (max−min)/median over the timed runs — so a
  * noisy line is visible IN the artifact instead of discovered a round
  * later. The scrub + GC settle one run's debt for the NEXT run and are
  * excluded from the timed window (timestamp taken right after the
  * action). A query is re-forked once when its spread exceeds 0.5
  * (within-run weather; keep the calmer attempt) or when its median
  * exceeds 2× the same line's median in the previous round's artifact
  * (cross-round weather, the r12 x8 blind spot; keep the faster attempt
  * — a reproduced slow number is real and stands). The discarded attempt
  * is recorded under `refork` with its reason, so a single load spike
  * can't enter the headline total unchallenged.
  *
  * `SPARK_GRAFT_BENCH_INPROC=1` keeps the old single-JVM path for quick
  * local iteration; the artifact then says "isolation":"in-process" so
  * the two modes can never be confused in a round comparison.
  */
object Bench {

  private val childRuns: Int = {
    val raw = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3")
    val n = try raw.toInt catch {
      case _: NumberFormatException =>
        sys.error(s"SPARK_GRAFT_BENCH_RUNS must be an integer >= 1, got '$raw'")
    }
    require(n >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $n")
    n
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 2 && args(0) == "--child") childMain(args(1))
    else parentMain()
  }

  private def buildSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.withDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", Scratch.warehouse)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** One run of one query, with post-run state scrub (operators may
    * persist intermediates and leave localCheckpoint RDD blocks behind —
    * clearCache misses the latter; leaked blocks starved later queries'
    * memory-sensitive joins 2.5-7× in the r02 driver run).
    */
  private def once(spark: SparkSession, sfDir: String,
                   name: String): Double = {
    val t0 = System.nanoTime()
    try {
      SparkEntry.queries(name)(spark, sfDir).count()
      // Timestamp BEFORE the scrub: the scrub + full GC below settle this
      // run's debt so it doesn't pollute the NEXT timing, and must not be
      // billed to THIS one (round-7 bug: elapsed was computed after the
      // finally block, inflating every line by scrub+GC cost).
      (System.nanoTime() - t0) / 1e9
    } finally {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
  }

  /** Child mode: warmup + N timed runs of ONE query in this fresh JVM;
    * prints a marker line the parent parses. Exit 1 on failure.
    */
  private def childMain(name: String): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = buildSession()
    try {
      once(spark, sfDir, name) // warmup, untimed
      val runs = (1 to childRuns).map(_ => once(spark, sfDir, name))
      println("BENCHCHILD {\"name\":\"" + name + "\",\"runs\":[" +
        runs.map(t => f"$t%.3f").mkString(",") + "]}")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        println("BENCHCHILD {\"name\":\"" + name + "\",\"error\":true}")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }

  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Relative spread (max−min)/median — 0.0 means the three runs agreed
    * exactly; ~0.3+ flags a line whose value is weather, not plan.
    */
  private[graft] def spread(xs: Seq[Double]): Double = {
    val m = median(xs)
    if (m <= 0) 0.0 else (xs.max - xs.min) / m
  }

  /** The named calibration lines. Their job is to RECORD machine weather
    * (CPU/scan via q1_agg, write/checkpoint IO via s13_io_cal) so code
    * lines' drift can be adjudicated against it — re-forking them and
    * keeping the calmer attempt would bias the noise estimate toward
    * calm and defeat the purpose (r13: s13_io_cal tripped the spread
    * valve on both shakedown runs, exactly because IO weather is what it
    * measures). They are exempt from both re-fork triggers and always
    * report their first fork's runs raw.
    */
  private[graft] val calibrationNames: Set[String] = Set("q1_agg", "s13_io_cal")

  /** Why a first fork's runs warrant one re-fork, or None to keep them.
    * Two triggers (VERDICT r12 #3 — the within-run valve alone was blind
    * to the r12 x8 family drift, whose spreads were all < 0.5):
    *  - "spread": the runs disagree by more than half their median —
    *    within-run weather;
    *  - "drift": the median is more than 2× the SAME line's median in
    *    the previous round's artifact — cross-round weather on a line
    *    whose code may be untouched. The re-fork either reproduces the
    *    slow number (then it's real and stands) or lands back in band.
    * Calibration lines never re-fork (see [[calibrationNames]]).
    */
  private[graft] def reforkReason(name: String, runs: Seq[Double],
                                  prevMedian: Option[Double]): Option[String] =
    if (calibrationNames.contains(name)) None
    else if (spread(runs) > 0.5) Some("spread")
    else if (prevMedian.exists(p => p > 0 && median(runs) > 2 * p))
      Some("drift")
    else None

  /** Tolerant extraction of the previous round's per-query medians from a
    * driver bench artifact's raw text. The artifact embeds the bench
    * stdout as an ESCAPED JSON string ("tail") that has historically been
    * front-truncated mid-object, so this never json-parses: it unescapes
    * `\"`, requires the sf label to match, cuts at the first "variance"
    * marker (the same query names recur there with spread values), and
    * scans name:double pairs, keeping registered query names. Returns
    * empty on any shape surprise — the drift valve then never fires,
    * which is the safe failure mode.
    */
  private[graft] def prevMedians(text: String, sfLabel: String,
                                 known: String => Boolean): Map[String, Double] = {
    val u = text.replace("\\\"", "\"")
    val sfNum = sfLabel.stripPrefix("sf")
    // Anchored numeric match (ADVICE r13): a raw substring test for
    // "sf": 1 also matched sf10/sf1.5 artifacts, which could seed the
    // drift baseline with cross-sf medians. The numeric form must be
    // closed by a non-digit; the label form is closed by its quote but
    // must tolerate pretty-printed JSON ('"sf": "sf1"' — the regenerated
    // BENCH_sf1.json shape, whose missed space left the valve with an
    // empty baseline for the whole first r14 sf1 run).
    val numRe = ("\"sf\":\\s*" + java.util.regex.Pattern.quote(sfNum) +
      "(\\.0)?\\s*[,}]").r
    val labelRe = ("\"sf\":\\s*\"" +
      java.util.regex.Pattern.quote(sfLabel) + "\"").r
    val sfOk = labelRe.findFirstIn(u).isDefined ||
      numRe.findFirstIn(u).isDefined
    if (!sfOk) return Map.empty
    val cut = u.indexOf("\"variance\"") match {
      case -1 => u
      case i => u.substring(0, i)
    }
    // \s* after the colon: driver artifacts embed the compact line
    // (no spaces) but the regenerated BENCH_sf1.json is pretty-printed
    // ("q1_agg": 0.613) — without the tolerance every sf1 run's valve
    // silently got 0 baseline medians (r14 finding; r13's sf1 runs were
    // equally valve-less without anyone noticing).
    val pair = """"([A-Za-z0-9_]+)":\s*(-?\d+\.\d+)""".r
    pair.findAllMatchIn(cut)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter { case (k, v) => known(k) && v > 0 }
      .toMap
  }

  /** The newest driver artifact (BENCH_r*.json in cwd) to compare against,
    * unless SPARK_GRAFT_BENCH_PREV points elsewhere ("" disables).
    *
    * "Newest" IS the previous round's close: the driver writes
    * BENCH_r{N}.json only when round N ends — after its bench run — so
    * every in-round invocation (builder iteration and the driver's own
    * round-close run alike) sees r{N-1} as the max. Same-session A/B
    * work that wants a different baseline pins SPARK_GRAFT_BENCH_PREV
    * explicitly (the r13 adjudication protocol).
    */
  private def loadPrevMedians(sfLabel: String): Map[String, Double] = {
    val path: Option[java.nio.file.Path] =
      sys.env.get("SPARK_GRAFT_BENCH_PREV") match {
        case Some("") => None
        case Some(p) => Some(java.nio.file.Paths.get(p))
        case None =>
          val cwd = java.nio.file.Paths.get(".")
          val re = """BENCH_r(\d+)\.json""".r
          import scala.jdk.CollectionConverters._
          // Files.list leaks a directory handle unless closed (ADVICE r13).
          val stream = java.nio.file.Files.list(cwd)
          try {
            stream.iterator().asScala
              .flatMap { p =>
                p.getFileName.toString match {
                  case re(n) => Some((n.toInt, p))
                  case _ => None
                }
              }.toSeq.sortBy(_._1).lastOption.map(_._2)
          } finally stream.close()
      }
    path.filter(java.nio.file.Files.isReadable(_)).map { p =>
      val text = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      val m = prevMedians(text, sfLabel, SparkEntry.queries.contains)
      System.err.println(
        s"[bench] drift baseline: ${m.size} medians from ${p.getFileName}")
      m
    }.getOrElse(Map.empty)
  }

  /** Fork one child JVM for `name`, inheriting this JVM's flags
    * (--add-opens, -Xmx, -D) and classpath, and parse its marker line.
    * Returns the timed runs, or None on any failure.
    */
  private def forkOne(name: String): Option[Seq[Double]] = {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"),
      "java").getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", cp, "graft.Bench", "--child", name)
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream)
      .getLines().toList
    val code = p.waitFor()
    val marker = out.find(_.startsWith("BENCHCHILD "))
    marker match {
      case Some(line) if code == 0 && line.contains("\"runs\":[") =>
        val runs = line.substring(line.indexOf("[") + 1, line.indexOf("]"))
          .split(',').toSeq.filter(_.nonEmpty).map(_.toDouble)
        if (runs.nonEmpty) Some(runs) else None
      case _ => None
    }
  }

  /** Ceiling for the compact stdout line. The driver parses the
    * `{"metric":` line out of the LAST 2000 chars of the merged build
    * output; sbt's `[success]`/timing trailer consumes ~150-200 of them,
    * so 1800 is the largest line that still parses with margin. (r13
    * shipped 1500, which 39 three-decimal medians already filled to
    * ~1.25k — one bench-set growth away from the queries map silently
    * dropping, the r11/r12 truncation class in a new costume. Compact
    * medians render at 2 decimals for the same reason; the 3-decimal
    * record lives in target/bench-detailed.json.)
    */
  private[graft] val CompactCap = 1800

  /** The single stdout line the driver captures. Queries ride along at
    * 2-decimal precision while they fit under [[CompactCap]]; a set too
    * large to fit drops the map (never truncates mid-JSON) — BenchSpec
    * pins that the CURRENT bench set plus headroom still fits.
    */
  private[graft] def compactLine(total: Double, medians: Seq[(String, Double)],
                                 runs: Int, isolation: String, cal: String,
                                 calIo: String, failedJson: String,
                                 sfLabel: String): String = {
    val qJson = medians
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val withQ =
      f"""{"metric":"bench_total","value":$total%.3f,"unit":"sec","queries":$qJson,"runs":$runs,"isolation":"$isolation","calibration":"$cal%s","calibration_io":"$calIo%s","failed":$failedJson%s,"sf":"$sfLabel"}"""
    if (withQ.length <= CompactCap) withQ
    else
      f"""{"metric":"bench_total","value":$total%.3f,"unit":"sec","runs":$runs,"isolation":"$isolation","calibration":"$cal%s","calibration_io":"$calIo%s","failed":$failedJson%s,"sf":"$sfLabel"}"""
  }

  private def parentMain(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Local-iteration filter (driver sets no filter → full set): comma
    // list of name prefixes, e.g. SPARK_GRAFT_BENCH_ONLY=x2_,x3_ivfpq.
    // SPARK_GRAFT_BENCH_EXTRA adds registered non-headline gates by exact
    // name (e.g. x3_dbscan for the sf1 artifact run) without widening the
    // driver's default per-round set.
    val extra = sys.env.get("SPARK_GRAFT_BENCH_EXTRA")
      .map(_.split(',').toSeq.filter(SparkEntry.queries.contains))
      .getOrElse(Seq.empty)
    val headline = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(pfx) =>
        val ps = pfx.split(',').toSeq
        SparkEntry.benchNames.filter(n => ps.exists(n.startsWith))
      case None => SparkEntry.benchNames
    }
    val names = (headline ++ extra).distinct.sorted
    val inProc = sys.env.get("SPARK_GRAFT_BENCH_INPROC").contains("1")
    // Attempts replaced by a re-fork (name → (reason, the runs that were
    // NOT used)); serialized into the artifact for transparency.
    val discardedRuns =
      scala.collection.mutable.Map.empty[String, (String, Seq[Double])]
    val sfLabel = sfDir.split('/').last
    val prev = if (inProc) Map.empty[String, Double]
               else loadPrevMedians(sfLabel)

    val measured: Seq[(String, Option[Seq[Double]])] =
      if (inProc) {
        val spark = buildSession()
        val r = names.map { n =>
          System.err.println(s"[bench] running $n (in-process)")
          n -> (try {
            once(spark, sfDir, n) // per-query warmup
            Some((1 to childRuns).map(_ => once(spark, sfDir, n)))
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $n failed: ${e.getMessage}")
            None
          })
        }
        spark.stop()
        r
      } else names.map { n =>
        System.err.println(s"[bench] forking $n")
        val first = forkOne(n)
        // Two re-fork triggers (one retry max, discarded attempt kept in
        // the artifact): "spread" — the runs disagreed by more than half
        // the median (r7 recorded x8_ktruss at 2.1× its idle-machine
        // median this way); keep the CALMER attempt. "drift" — the median
        // is >2× the same line's median in the previous round's artifact
        // (the r12 x8 family drifted +57% with zero code change and
        // within-run spreads under 0.35, so the spread valve never saw
        // it); keep the FASTER attempt — a reproduced slow number is real
        // and stands, a one-off load window lands back in band.
        first match {
          case Some(r1) =>
            reforkReason(n, r1, prev.get(n)) match {
              case Some(reason) =>
                System.err.println(
                  f"[bench] $n median ${median(r1)}%.2f spread " +
                    f"${spread(r1)}%.2f prev ${prev.getOrElse(n, -1.0)}%.2f" +
                    s" — re-forking once ($reason)")
                forkOne(n) match {
                  case Some(r2) =>
                    val keepSecond =
                      if (reason == "drift") median(r2) < median(r1)
                      else spread(r2) < spread(r1)
                    if (keepSecond) {
                      discardedRuns(n) = (reason, r1); n -> Some(r2)
                    } else {
                      discardedRuns(n) = (reason, r2); n -> Some(r1)
                    }
                  case None => n -> Some(r1)
                }
              case None => n -> Some(r1)
            }
          case None => n -> None
        }
      }

    val qJson = measured
      .map { case (k, v) =>
        "\"" + k + "\":" + f"${v.map(median).getOrElse(-1.0)}%.3f" }
      .mkString("{", ",", "}")
    val varJson = measured
      .map { case (k, v) =>
        "\"" + k + "\":" + f"${v.map(spread).getOrElse(-1.0)}%.3f" }
      .mkString("{", ",", "}")
    val total = measured.flatMap(_._2).map(median).sum
    val failed = measured.collect { case (k, None) => "\"" + k + "\"" }
    val failedJson = failed.mkString("[", ",", "]")
    val isolation = if (inProc) "in-process" else "jvm"
    val refork = discardedRuns.toSeq.sortBy(_._1)
      .map { case (k, (reason, rs)) =>
        "\"" + k + "\":{\"median\":" + f"${median(rs)}%.3f" +
          ",\"variance\":" + f"${spread(rs)}%.3f" +
          ",\"reason\":\"" + reason + "\"}" }
      .mkString("{", ",", "}")
    // Calibration lines: fixed queries whose code never changes
    // round-over-round, so their drift vs the previous artifact
    // estimates machine load — a total that moved with them is weather,
    // one that moved without them is code. q1_agg calibrates CPU/scan
    // (VERDICT r9); s13_io_cal calibrates write/checkpoint IO (VERDICT
    // r12 #3 — both r12 anomalies were IO-noise classes a CPU line is
    // structurally blind to). Each is named only when it actually
    // MEASURED — a crashed fork records -1.0, and naming that would
    // classify every drift as code.
    def calName(n: String): String =
      if (measured.exists { case (k, v) => k == n && v.isDefined }) n else ""
    val calibration = calName("q1_agg")
    val calibrationIo = calName("s13_io_cal")
    // Artifact contract (VERDICT r12 #1 — the third attempt at this, and
    // the first that replicates the driver's capture): the driver keeps
    // only the last ~2000 chars of the build output and json-parses the
    // line starting with {"metric":. Rounds 11 and 12 both shipped
    // "parsed": null because a ~3.4k-char detailed line (queries +
    // variance + refork) was printed near the end — whatever stream
    // interleaving sbt chose, SOME copy of it crowded the compact line
    // out of the window. So: no long line is ever printed to EITHER
    // stream now — r12's capture proves the driver merges stderr into
    // the window AND that sbt can flush a pre-compact stderr line AFTER
    // the stdout compact line, so even a "printed earlier" stderr copy
    // is unsafe. The detailed record goes ONLY to a file
    // (target/bench-detailed.json); stdout carries exactly ONE
    // {"metric": line, guarded to <= CompactCap chars (2-decimal
    // medians; variance/refork never ride along), leaving slack for
    // sbt's [success] trailer inside the 2000-char window. The verify
    // skill replicates the capture (last 2000 chars → parse) as a
    // round-close gate; BenchSpec pins the headroom.
    val detailed =
      f"""{"metric":"bench_total","value":$total%.3f,"unit":"sec","queries":$qJson,"variance":$varJson,"runs":$childRuns,"isolation":"$isolation","calibration":"$calibration%s","calibration_io":"$calibrationIo%s","refork":$refork%s,"failed":$failedJson%s,"sf":"$sfLabel"}"""
    val detailPath = java.nio.file.Paths.get("target", "bench-detailed.json")
    try {
      java.nio.file.Files.createDirectories(detailPath.getParent)
      java.nio.file.Files.write(detailPath,
        (detailed + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // Append-only history: detailed.json is overwritten per run, but
      // same-session A/B work needs the earlier runs (r13 session 7 had
      // to hand-copy run A before run B clobbered it). One line per run.
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target", "bench-history.jsonl"),
        (detailed + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      System.err.println(s"[bench] detailed artifact -> $detailPath")
    } catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $detailPath: $e")
    }
    val compact = compactLine(total,
      measured.map { case (k, v) => k -> v.map(median).getOrElse(-1.0) },
      childRuns, isolation, calibration, calibrationIo, failedJson, sfLabel)
    println(compact)
    // A crashed query must not silently *shrink* the reported total — fail
    // the whole bench run loudly (after printing, so the JSON still shows
    // which queries died).
    if (failed.nonEmpty) sys.exit(1)
  }
}
