package graft.functions

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.{Scratch, SparkSpec}
import org.apache.spark.sql.functions._

class ZipTextSourceSpec extends SparkSpec {
  import spark.implicits._

  private val FMT = "org.apache.spark.sql.graft.ZipTextSource"

  /** Stage `docs` as (member -> text) entries split across two archives. */
  private def stageZips(docs: Seq[(String, String)]): String = {
    val dir = Scratch.fresh("zipsrc")
    docs.zipWithIndex.groupBy(_._2 % 2).foreach { case (shard, members) =>
      val z = new ZipOutputStream(
        new FileOutputStream(s"$dir/shard$shard.zip"))
      try members.foreach { case ((name, text), _) =>
        z.putNextEntry(new ZipEntry(name))
        z.write(text.getBytes("UTF-8"))
        z.closeEntry()
      } finally z.close()
    }
    dir
  }

  private val fixture = Seq(
    "doc_1.txt" -> "hello zip world",
    "doc_2.txt" -> "the quick brown fox",
    "doc_3.txt" -> "",
    "meta_readme.txt" -> "not a doc")

  test("reads every member with exact text and byte counts") {
    val dir = stageZips(fixture)
    val got = spark.read.format(FMT).load(dir)
      .select("member", "n_bytes", "text")
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == fixture.map(_._1).toSet)
    fixture.foreach { case (m, text) =>
      assert(got(m) == ((text.getBytes("UTF-8").length.toLong, text)))
    }
    // one partition per archive
    val parts = spark.read.format(FMT).load(dir).rdd.getNumPartitions
    assert(parts == 2)
  }

  test("short name 'graft-zip' resolves via the service registry") {
    val dir = stageZips(fixture)
    assert(spark.read.format("graft-zip").load(dir).count() == 4)
  }

  test("member prefix/equality filters are pushed into the scan") {
    val dir = stageZips(fixture)
    val df = spark.read.format(FMT).load(dir)
      .filter($"member".startsWith("doc_"))
    assert(df.count() == 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedMemberFilters: [StringStartsWith(member,doc_)"),
      s"filter must reach the scan:\n$plan")
    val one = spark.read.format(FMT).load(dir)
      .filter($"member" === "doc_2.txt")
      .select("text").as[String].collect()
    assert(one.toSeq == Seq("the quick brown fox"))
  }

  test("column pruning reaches the scan (payload skipped for counts)") {
    val dir = stageZips(fixture)
    val df = spark.read.format(FMT).load(dir).select("member")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<member:string>"),
      s"pruned schema must reach the scan:\n$plan")
    assert(df.count() == 4)
  }

  test("pushed filters compose with residual Spark filters") {
    val dir = stageZips(fixture)
    val got = spark.read.format(FMT).load(dir)
      .filter($"member".startsWith("doc_") && length($"text") > 0)
      .select("member").as[String].collect().toSet
    assert(got == Set("doc_1.txt", "doc_2.txt"))
  }

  test("write: round trip through the sink, one archive per partition") {
    val dir = Scratch.fresh("zipsink")
    val df = fixture.toDF("member", "text").repartition(3)
    df.write.format(FMT).mode("append").save(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted // Hadoop local-FS .crc sidecars
    assert(files.forall(f => f.startsWith("part-") && f.endsWith(".zip")),
      s"only committed archives on disk: ${files.toSeq}")
    assert(files.length <= 3 && files.nonEmpty)
    val back = spark.read.format(FMT).load(dir)
      .select("member", "text").as[(String, String)].collect().toMap
    assert(back == fixture.toMap)
  }

  test("write: overwrite truncates previous archives, empty partitions skip") {
    val dir = Scratch.fresh("zipsink")
    Seq("a.txt" -> "one").toDF("member", "text")
      .write.format(FMT).mode("append").save(dir)
    // 8 partitions, 2 rows: empty tasks must not leave empty archives
    Seq("b.txt" -> "two", "c.txt" -> "three").toDF("member", "text")
      .repartition(8)
      .write.format(FMT).mode("overwrite").save(dir)
    val back = spark.read.format(FMT).load(dir)
      .select("member").as[String].collect().toSet
    assert(back == Set("b.txt", "c.txt"), "overwrite must drop a.txt")
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(files.forall(_.endsWith(".zip")))
    assert(files.length <= 2, s"no empty-partition archives: ${files.toSeq}")
  }

  test("streaming read: archives arriving between batches are picked up once") {
    val dir = Scratch.fresh("zipstream")
    val out = Scratch.fresh("zipstream-out")
    val ck = Scratch.fresh("zipstream-ck")
    def writeZip(name: String, members: Seq[(String, String)]): Unit = {
      val z = new ZipOutputStream(new FileOutputStream(s"$dir/$name"))
      try members.foreach { case (m, t) =>
        z.putNextEntry(new ZipEntry(m)); z.write(t.getBytes("UTF-8"))
        z.closeEntry()
      } finally z.close()
    }
    writeZip("a.zip", Seq("a1.txt" -> "alpha", "a2.txt" -> "beta"))
    def drain(): Unit = {
      val q = spark.readStream.format(FMT).load(dir)
        .select("member", "text")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() == 2)
    // a new archive lands; restart from the checkpoint — only the new
    // file is read (offset = seen-file set), nothing re-ingested
    writeZip("b.zip", Seq("b1.txt" -> "gamma"))
    drain()
    val back = spark.read.parquet(out)
      .select("member", "text").as[(String, String)].collect().toMap
    assert(back == Map("a1.txt" -> "alpha", "a2.txt" -> "beta",
      "b1.txt" -> "gamma"))
  }

  test("archive filters prune whole archives at planning time") {
    val dir = stageZips(fixture)
    val df = spark.read.format(FMT).load(dir)
      .filter($"archive".endsWith("shard0.zip") === false)
      .filter($"archive".startsWith(dir))
    // prefix filter pushes; the residual endsWith stays with Spark
    val one = spark.read.format(FMT).load(dir)
      .filter($"archive" === s"file:$dir/shard0.zip")
    // equality on archive prunes to ONE input partition
    assert(one.rdd.getNumPartitions <= 1)
    val members = one.select("member").as[String].collect().toSet
    assert(members.nonEmpty && members.subsetOf(fixture.map(_._1).toSet))
    // full read still sees everything (filters only narrow)
    assert(spark.read.format(FMT).load(dir).count() == 4)
    // correctness under the filter: rows only from the matching archive
    val archs = one.select("archive").distinct().as[String].collect()
    assert(archs.forall(_.endsWith("shard0.zip")))
  }

  test("maxFilesPerTrigger bounds archives per micro-batch; all data drains") {
    val dir = Scratch.fresh("zipmax")
    val out = Scratch.fresh("zipmax-out")
    val ck = Scratch.fresh("zipmax-ck")
    (0 until 3).foreach { i =>
      val z = new ZipOutputStream(new FileOutputStream(s"$dir/f$i.zip"))
      try {
        z.putNextEntry(new ZipEntry(s"m$i.txt")); z.write(s"v$i".getBytes)
        z.closeEntry()
      } finally z.close()
    }
    val q = spark.readStream.format(FMT)
      .option("maxFilesPerTrigger", "1").load(dir)
      .select("member", "text")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"1 archive per batch => >=3 data batches, got $batches")
    assert(spark.read.parquet(out).count() == 3, "everything drains")
  }

  test("streaming offsets round-trip through their JSON form") {
    import org.apache.spark.sql.graft.{ZipStreamOffset => O}
    val o = O(Seq("""/x/a "quoted".zip""", "/x/b\\back.zip"))
    assert(O.fromJson(o.json()).files.sorted == o.files.sorted)
    assert(O.fromJson(O(Seq.empty).json()).files.isEmpty)
  }

  test("mode=permissive survives a truncated archive; default failfast throws") {
    val dir = Scratch.fresh("zipbad")
    val good = Seq("g1.txt" -> ("alpha " * 50), "g2.txt" -> "beta")
    val z = new ZipOutputStream(new FileOutputStream(s"$dir/good.zip"))
    try good.foreach { case (m, t) =>
      z.putNextEntry(new ZipEntry(m)); z.write(t.getBytes("UTF-8"))
      z.closeEntry()
    } finally z.close()
    // a structurally-started but truncated archive: valid local header,
    // compressed payload cut mid-stream
    val buf = new java.io.ByteArrayOutputStream()
    val zb = new ZipOutputStream(buf)
    zb.putNextEntry(new ZipEntry("bad.txt"))
    zb.write(("x" * 100000).getBytes("UTF-8"))
    zb.closeEntry(); zb.close()
    val cut = buf.toByteArray.take(120)
    val f = new FileOutputStream(s"$dir/trunc.zip")
    try f.write(cut) finally f.close()

    intercept[org.apache.spark.SparkException] {
      spark.read.format(FMT).load(dir).select("text").count()
    }
    val got = spark.read.format(FMT).option("mode", "permissive").load(dir)
      .select("member").as[String].collect().toSet
    assert(Set("g1.txt", "g2.txt").subsetOf(got),
      s"good archive fully read, got $got")
  }

  test("append never clobbers archives from an earlier job") {
    val dir = Scratch.fresh("zipsink")
    Seq("a.txt" -> "one").toDF("member", "text")
      .repartition(1).write.format(FMT).mode("append").save(dir)
    // Second job also commits partition 0 — with fixed part-NNNNN names
    // this silently replaced the first job's archive.
    Seq("b.txt" -> "two").toDF("member", "text")
      .repartition(1).write.format(FMT).mode("append").save(dir)
    val back = spark.read.format(FMT).load(dir)
      .select("member").as[String].collect().toSet
    assert(back == Set("a.txt", "b.txt"),
      s"both jobs' archives must survive an append, got $back")
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(files.length == 2 && files.toSet.size == 2,
      s"distinct committed names per job: ${files.toSeq}")
  }

  test("mode=permissive survives an unopenable archive (open-time failure)") {
    val dir = stageZips(fixture)
    // A directory with a .zip name: listed at planning time, but fs.open
    // fails — the permissive catch must cover the reader's open, not only
    // entry iteration.
    assert(new java.io.File(s"$dir/bogus.zip").mkdir())
    intercept[org.apache.spark.SparkException] {
      spark.read.format(FMT).load(dir).select("member").count()
    }
    val got = spark.read.format(FMT).option("mode", "permissive").load(dir)
      .select("member").as[String].collect().toSet
    assert(got == fixture.map(_._1).toSet,
      s"readable archives fully read despite the unopenable one, got $got")
  }

  test("write rejects inputs without member/text columns") {
    val dir = Scratch.fresh("zipsink")
    val ex = intercept[Exception] {
      Seq((1L, "x")).toDF("id", "payload")
        .write.format(FMT).mode("append").save(dir)
    }
    assert(ex.getMessage.contains("member"))
  }

  test("commit aborts loudly when fs.rename reports failure") {
    // HDFS-style FileSystems signal a refused move by RETURNING FALSE from
    // rename (destination exists, quota, ...), not by throwing — a commit
    // that ignores the boolean silently drops the partition's archive.
    // Drive the real driver-side commit through a wrapper scheme whose
    // rename always refuses, and assert the loud IOException path
    // (ZipTextSource commit).
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.failrename.impl", classOf[FailRenameFileSystem].getName)
    hconf.setBoolean("fs.failrename.impl.disable.cache", true)
    val dir = Scratch.fresh("zipsink")
    val ex = intercept[Exception] {
      Seq("m1.txt" -> "payload one", "m2.txt" -> "payload two")
        .toDF("member", "text").coalesce(1)
        .write.format(FMT).mode("append").save(s"failrename://$dir")
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.contains("graft-zip commit failed"),
      s"expected the loud commit-abort IOException, got: $chain")
    // The temp file written by the task is still on disk (commit threw
    // before cleanup); no committed part-*.zip may exist.
    val committed = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".zip"))
    assert(committed.isEmpty,
      s"no archive may be committed after a refused rename: ${committed.toSeq}")
  }
}

/** RawLocalFileSystem under scheme `failrename://` whose rename always
  * returns false — simulates an HDFS destination-exists/refused move for
  * the commit-failure spec. Instantiated reflectively by Hadoop.
  */
class FailRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("failrename:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = false
}
