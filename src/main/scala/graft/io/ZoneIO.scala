package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.model.{Format, Zone}

/** Multi-format zone readers/writers — the reference's source/sink surface
  * (SURVEY.md §2.1 S1-S4, S9):
  *
  *  - S1 JSON scan with schema inference
  *    (reference k8s/submit/etl-on-gcp-vinicius-campos.py:22-25)
  *  - S2 Parquet glob scan (etl-on-gcp-vinicius-campos.py:39-41,
  *    glob path pyfiles.zip/variables.py:9)
  *  - S3 Parquet sink, overwrite (etl-on-gcp-vinicius-campos.py:31)
  *  - S4 Avro sink, overwrite (etl-on-gcp-vinicius-campos.py:57-61; the avro
  *    source ships inside Spark 4's sql jar, no extra connector)
  *  - S9 files → warehouse table truncate-load
  *    (k8s/dags/etl-gcp-vinicius-campos.py:132-142)
  *
  * Schema is inferred end-to-end like the reference (§1.3), with an optional
  * explicit StructType override for production hardening.
  */
object Readers {

  def read(spark: SparkSession, format: Format, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format(format.name)
    // CSV is headerless + string-typed by default; a zone round-trip needs
    // the header for names and inference for types (schema overrides both).
    val r1 = format match {
      case Format.Csv =>
        val h = r.option("header", "true")
        if (schema.isEmpty) h.option("inferSchema", "true") else h
      case _ => r
    }
    schema.fold(r1)(r1.schema).load(path)
  }

  def zone(spark: SparkSession, z: Zone, rel: String = ""): DataFrame =
    read(spark, z.format, z.path(rel))
}

object Writers {

  /** Overwrite-write in the zone's format (the reference's only write mode —
    * daily full re-run, etl-gcp-vinicius-campos.py:45).
    */
  def write(df: DataFrame, format: Format, path: String): Unit = {
    val w = df.write.format(format.name)
    val w1 = format match {
      case Format.Csv => w.option("header", "true")
      case _ => w
    }
    w1.mode(SaveMode.Overwrite).save(path)
  }

  def zone(df: DataFrame, z: Zone, rel: String = ""): Unit =
    write(df, z.format, z.path(rel))

  /** Hive-style partitioned write: one directory per partition value. At
    * fact-table scale this is what makes time/tenant predicates prune whole
    * directories at planning time (PartitionFilters in the scan) instead of
    * reading 100 TB to filter.
    */
  def writePartitioned(df: DataFrame, format: Format, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.format(format.name)
      .partitionBy(partitionCols: _*)
      .mode(SaveMode.Overwrite).save(path)

  /** S9: truncate-load files into a catalog table (`WRITE_TRUNCATE` +
    * autodetect semantics of the reference's BigQuery load; schema rides
    * with the DataFrame).
    */
  /** Drop a managed table AND its on-disk location. The location can survive
    * from a previous process while the (in-memory) catalog forgot the
    * table — a truncate-load owns its target, so clear it rather than
    * failing LOCATION_ALREADY_EXISTS.
    *
    * The location is resolved from the catalog when the table is still
    * registered (so we delete what the table actually owned), falling back
    * to the catalog's default path for the orphaned-directory case; deletion
    * goes through the Hadoop FileSystem of the resolved URI, so a cluster
    * warehouse (hdfs://, s3a://, ...) is cleaned the same as a local one.
    */
  def dropManaged(spark: SparkSession, database: String, table: String): Unit = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val catalog = spark.sessionState.catalog
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    val ident = TableIdentifier(table, Some(database))
    // Only a MANAGED table's location may be destroyed: an EXTERNAL table
    // points at data this load does not own (DROP TABLE leaves it intact
    // by design, and so must we).
    val location: Option[java.net.URI] =
      if (catalog.tableExists(ident)) {
        val meta = catalog.getTableMetadata(ident)
        if (meta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED)
          Some(meta.location)
        else None
      } else Some(catalog.defaultTablePath(ident))
    spark.sql(s"DROP TABLE IF EXISTS $database.$table")
    location.foreach { loc =>
      val path = new org.apache.hadoop.fs.Path(loc)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
  }

  def loadTable(spark: SparkSession, source: Zone, rel: String,
                database: String, table: String): Unit = {
    dropManaged(spark, database, table)
    Readers.zone(spark, source, rel)
      .write.mode(SaveMode.Overwrite).saveAsTable(s"$database.$table")
  }
}

/** Small-files compaction. Streaming sinks and fine-grained partitioned
  * writes leave behind thousands of KB-scale files; every downstream scan
  * then pays a per-file open + footer read and schedules splinter tasks —
  * at warehouse scale the metadata overhead dwarfs the data. Compaction
  * rewrites a directory into ~`targetBytes` outputs sized from the ACTUAL
  * on-disk byte count (listed through the Hadoop FileSystem, so any
  * warehouse scheme works), not a guessed partition number.
  */
object Compact {

  /** Total bytes of data files under `dir` (Spark bookkeeping excluded). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Rewrite `srcDir` into `destDir` as ceil(bytes / targetBytes) files.
    * Returns the output file count. (Overwrite semantics, same format.)
    */
  def compactTo(spark: SparkSession, srcDir: String, destDir: String,
                format: Format, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val total = dataBytes(spark, srcDir)
    val parts = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    Writers.write(
      Readers.read(spark, format, srcDir).repartition(parts),
      format, destDir)
    parts
  }
}
