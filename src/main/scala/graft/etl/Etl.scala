package graft.etl

import java.nio.file.{Files, Paths, Path}
import java.util.Comparator
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.checks.Check
import graft.io.{Readers, Writers}
import graft.model.{Format, Zone}
import graft.pipeline.{Pipeline, PipelineRun, Task}

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

  /** The full O1-O10 DAG over a scratch root. Returns the run plus the
    * database.table it loaded.
    */
  def pipeline(spark: SparkSession, scratchRoot: String, sourceParquet: String,
               orderBy: Seq[String], database: String = "graft",
               table: String = "etl_out"): (PipelineRun, String) = {
    val root = Paths.get(scratchRoot)
    val landing = Zone(s"$scratchRoot/landing", Format.Json)
    val processing = Zone(s"$scratchRoot/processing", Format.Parquet)
    val curated = Zone(s"$scratchRoot/curated", Format.Avro)
    val fq = s"$database.$table"

    def rmtree(p: Path): Unit = if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))

    val tasks = Seq(
      // O1: idempotent zone namespace creation (ref :64-75).
      Task("create_zones")(() =>
        Seq(landing, processing, curated).foreach(z =>
          Files.createDirectories(Paths.get(z.root)))),
      // O2: ingest into landing (ref :49-56 invokes the cloud function; here
      // the source parquet is staged as landing line-delimited JSON).
      Task("ingest", deps = Seq("create_zones"))(() =>
        spark.read.parquet(sourceParquet)
          .write.mode("overwrite").json(landing.root)),
      // O3+O4: compute exists (getOrCreate) + submit job (ref :77-107).
      Task("json_to_parquet", deps = Seq("ingest"))(() => {
        val n = jsonToParquet(spark, landing, processing)
        require(n > 0, "no rows after ingest")
      }),
      // O5 sensor collapses into the synchronous call; O6 teardown is the
      // session's own lifecycle (spark.stop in the caller's finally).
      Task("sql_transform", deps = Seq("json_to_parquet"))(() =>
        transform(spark, processing, curated, queryRegistry(orderBy)("ETL_GCP"))),
      // O7+O8: warehouse dataset + truncate-load (ref :126-142).
      Task("load_table", deps = Seq("sql_transform"))(() =>
        Writers.loadTable(spark, curated, "", database, table)),
      // O9: count gate (ref :144-155).
      Task("count_check", deps = Seq("load_table"))(() =>
        Check("count_check", s"SELECT count(*) FROM $fq").assertPasses(spark)),
      // O10: cleanup zones, gated on the check (ref :157-167).
      Task("cleanup", deps = Seq("count_check"))(() =>
        Seq(landing, processing, curated).foreach(z => rmtree(Paths.get(z.root)))))

    (new Pipeline(tasks).run(), fq)
  }
}
