package graft.etl

import java.nio.file.{Files, Paths, Path}
import java.util.Comparator
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.checks.Check
import graft.io.{Readers, Writers}
import graft.model.{Format, Zone}
import graft.pipeline.{AsyncJob, JobHandle, Pipeline, PipelineRun, Task}

/** The reference's two Spark jobs plus the full orchestration DAG, expressed
  * over a local three-zone layout (SURVEY.md §3; reference
  * k8s/submit/etl-on-gcp-vinicius-campos.py + k8s/dags/etl-gcp-vinicius-campos.py).
  */
object Etl {

  /** Named query registry (R6) — the reference keeps its SQL in a map
    * (pyfiles.zip/my_query.py:1-9). The canonical form adds a total-order
    * ORDER BY; bare LIMIT is row-order-nondeterministic (SURVEY §2.2 R3).
    */
  def queryRegistry(orderBy: Seq[String]): Map[String, String] = Map(
    "ETL_GCP" ->
      s"SELECT * FROM df ORDER BY ${orderBy.mkString(", ")} LIMIT 100")

  /** §3.2 `read_json_and_write_parquet`
    * (etl-on-gcp-vinicius-campos.py:19-33): JSON scan with inference, a
    * count action, Parquet overwrite. The reference scans the JSON three
    * times (infer, count, write); we read once and count the *written*
    * parquet, which is both cheaper and a better sanity signal.
    */
  def jsonToParquet(spark: SparkSession, landing: Zone, processing: Zone,
                    rel: String = ""): Long = {
    val df = Readers.zone(spark, landing, rel)
    Writers.zone(df, processing)
    Readers.zone(spark, processing).count()
  }

  /** §3.1 the SQL transform (etl-on-gcp-vinicius-campos.py:35-63): Parquet
    * scan → temp view → spark.sql → cache → Avro write → drop view. The
    * reference caches *after* dropping the view and never reuses the cache
    * (S6 caveat) — we cache before the write so the count-back is free.
    */
  def transform(spark: SparkSession, processing: Zone, curated: Zone,
                sql: String): DataFrame = {
    val df = Readers.zone(spark, processing)
    df.createOrReplaceTempView("df")
    val out = spark.sql(sql).cache()
    Writers.zone(out, curated)
    spark.catalog.dropTempView("df")
    out
  }

  /** Zip every regular file under `dir` (relative paths preserved) into
    * `zipPath`, skipping Spark bookkeeping files — fabricates the external
    * provider's archive that the reference's cloud function downloads.
    */
  private def zipDir(dir: Path, zipPath: Path): Unit = {
    val zout = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(zipPath))
    val walk = Files.walk(dir) // must close: holds open directory handles
    try {
      walk.filter(Files.isRegularFile(_))
        .filter(p => !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith("."))
        .sorted()
        .forEach { p =>
          zout.putNextEntry(new java.util.zip.ZipEntry(
            dir.relativize(p).toString))
          Files.copy(p, zout)
          zout.closeEntry()
        }
    } finally {
      walk.close()
      zout.close()
    }
  }

  /** The full O1-O10 DAG over a scratch root. Returns the run plus the
    * database.table it loaded.
    *
    * @param sensorPollMs job-sensor poll interval; the reference polls
    *                     every 15 000 ms (dag :114) — specs shrink it.
    */
  def pipeline(spark: SparkSession, scratchRoot: String, sourceParquet: String,
               orderBy: Seq[String], database: String = "graft",
               table: String = "etl_out",
               sensorPollMs: Long = 50L): (PipelineRun, String) = {
    val root = Paths.get(scratchRoot)
    val landing = Zone(s"$scratchRoot/landing", Format.Json)
    val processing = Zone(s"$scratchRoot/processing", Format.Parquet)
    val curated = Zone(s"$scratchRoot/curated", Format.Avro)
    val staging = Paths.get(s"$scratchRoot/staging")
    val fq = s"$database.$table"
    val handle =
      new java.util.concurrent.atomic.AtomicReference[JobHandle[Long]]()

    def rmtree(p: Path): Unit = if (Files.exists(p)) {
      val walk = Files.walk(p) // must close: holds open directory handles
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }

    val tasks = Seq(
      // O1: idempotent zone namespace creation (ref :64-75).
      Task("create_zones")(() =>
        Seq(landing, processing, curated).foreach(z =>
          Files.createDirectories(Paths.get(z.root)))),
      // Stand-in for the external data provider: source parquet → JSON →
      // one zip archive (what the reference's HTTP endpoint serves).
      Task("stage_source", deps = Seq("create_zones"))(() => {
        Files.createDirectories(staging)
        spark.read.parquet(sourceParquet)
          .write.mode("overwrite").json(s"$staging/json")
        zipDir(staging.resolve("json"), staging.resolve("payload.zip"))
      }),
      // O2: the ingest function proper (ref :49-56 invokes the cloud
      // function; cloud-function/main.py:14-31 downloads the zip and
      // extracts members into landing) — S8 wired into the gated DAG.
      Task("ingest", deps = Seq("stage_source"))(() => {
        val files = graft.ingest.HttpZipIngest.ingest(
          s"file://${staging.resolve("payload.zip")}", landing.root)
        require(files.nonEmpty, "ingest extracted no files")
      }),
      // O3+O4: compute exists (getOrCreate) + ASYNCHRONOUS submit
      // (ref :77-107, asynchronous=True :105) — returns a handle, no wait.
      Task("submit_job", deps = Seq("ingest"))(() =>
        handle.set(AsyncJob.submit(jsonToParquet(spark, landing, processing)))),
      // O5: the job sensor — polls the handle until terminal (ref :109-116,
      // 15 s poke interval) and fails if the job failed or produced 0 rows.
      Task("job_sensor", deps = Seq("submit_job"))(() => {
        val n = AsyncJob.awaitDone(handle.get(), sensorPollMs,
          timeoutMs = 30 * 60 * 1000L)
        require(n > 0, "no rows after ingest")
      }),
      // O6 teardown is the session's own lifecycle (spark.stop in the
      // caller's finally).
      Task("sql_transform", deps = Seq("job_sensor"))(() =>
        transform(spark, processing, curated, queryRegistry(orderBy)("ETL_GCP"))),
      // O7+O8: warehouse dataset + truncate-load (ref :126-142).
      Task("load_table", deps = Seq("sql_transform"))(() =>
        Writers.loadTable(spark, curated, "", database, table)),
      // O9: count gate (ref :144-155).
      Task("count_check", deps = Seq("load_table"))(() =>
        Check("count_check", s"SELECT count(*) FROM $fq").assertPasses(spark)),
      // O10: cleanup zones + staging, gated on the check (ref :157-167).
      Task("cleanup", deps = Seq("count_check"))(() => {
        Seq(landing, processing, curated).foreach(z => rmtree(Paths.get(z.root)))
        rmtree(staging)
      }))

    (new Pipeline(tasks).run(), fq)
  }
}
