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
  * action). A query whose spread exceeds 0.5 is re-forked once and the
  * calmer attempt kept, the discarded attempt recorded under `refork` —
  * so a single load spike can't enter the headline total unchallenged.
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

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Relative spread (max−min)/median — 0.0 means the three runs agreed
    * exactly; ~0.3+ flags a line whose value is weather, not plan.
    */
  private def spread(xs: Seq[Double]): Double = {
    val m = median(xs)
    if (m <= 0) 0.0 else (xs.max - xs.min) / m
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
    // High-spread attempts replaced by a calmer re-fork (name → the runs
    // that were NOT used); serialized into the artifact for transparency.
    val discardedRuns = scala.collection.mutable.Map.empty[String, Seq[Double]]

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
        // A spread above 0.5 means the runs disagreed by more than half
        // the median — machine weather, not plan (r7 recorded x8_ktruss
        // at 2.1× its idle-machine median this way). Re-fork once and
        // keep the calmer attempt; the discarded one is still recorded
        // in the artifact's `refork` field so the retry is visible.
        first match {
          case Some(r1) if spread(r1) > 0.5 =>
            System.err.println(
              f"[bench] $n spread ${spread(r1)}%.2f > 0.5 — re-forking once")
            forkOne(n) match {
              case Some(r2) if spread(r2) < spread(r1) =>
                discardedRuns(n) = r1; n -> Some(r2)
              case Some(r2) =>
                discardedRuns(n) = r2; n -> Some(r1)
              case None => n -> Some(r1)
            }
          case other => n -> other
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
    val sf = sfDir.split('/').last
    val isolation = if (inProc) "in-process" else "jvm"
    val refork = discardedRuns.toSeq.sortBy(_._1)
      .map { case (k, rs) =>
        "\"" + k + "\":{\"median\":" + f"${median(rs)}%.3f" +
          ",\"variance\":" + f"${spread(rs)}%.3f" + "}" }
      .mkString("{", ",", "}")
    // Calibration line (VERDICT r9 "what's wrong" #2): q1_agg is a fixed
    // trivial query whose code never changes round-over-round, so its
    // drift in THIS artifact vs the previous one estimates the machine
    // load factor — a total that moved with q1_agg is weather, one that
    // moved without it is code. Named in the artifact so the comparison
    // is self-adjudicating instead of needing a judge probe. Only named
    // when it actually MEASURED — a crashed fork records -1.0 in
    // queries, and naming that as the calibration would classify every
    // drift as code.
    val calibration =
      if (measured.exists { case (k, v) => k == "q1_agg" && v.isDefined })
        "q1_agg" else ""
    // Artifact-ordering contract (VERDICT r11 item 3): the driver captures
    // only the last ~2000 chars of stdout and parses the line starting
    // with {"metric": — in r11 the single detailed line (queries +
    // variance + refork) outgrew that window and was truncated at the
    // FRONT, so the round recorded "parsed": null. Print the detailed
    // line FIRST (humans, PLANS, stderr copy), then a compact line LAST
    // whose size is guarded: per-query medians ride along only while the
    // line stays well inside the window; variance/refork never do (they
    // are in the detailed line and on stderr).
    val detailed =
      f"""{"metric":"bench_total","value":$total%.3f,"unit":"sec","queries":$qJson,"variance":$varJson,"runs":$childRuns,"isolation":"$isolation","calibration":"$calibration%s","refork":$refork%s,"failed":$failedJson%s,"sf":"$sf"}"""
    println(detailed)
    System.err.println(detailed)
    val compactWithQ =
      f"""{"metric":"bench_total","value":$total%.3f,"unit":"sec","queries":$qJson,"runs":$childRuns,"isolation":"$isolation","calibration":"$calibration%s","failed":$failedJson%s,"sf":"$sf"}"""
    val compact =
      if (compactWithQ.length <= 1800) compactWithQ
      else
        f"""{"metric":"bench_total","value":$total%.3f,"unit":"sec","runs":$childRuns,"isolation":"$isolation","calibration":"$calibration%s","failed":$failedJson%s,"sf":"$sf"}"""
    println(compact)
    // A crashed query must not silently *shrink* the reported total — fail
    // the whole bench run loudly (after printing, so the JSON still shows
    // which queries died).
    if (failed.nonEmpty) sys.exit(1)
  }
}
