package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data model: tables of named, typed columns materialized as files in
  * storage zones (reference: pyfiles.zip/variables.py:6-12 three-zone
  * landing/processing/curated layout; SURVEY.md §1).
  */
sealed trait Format { def name: String }
object Format {
  case object Json extends Format { val name = "json" }
  case object Parquet extends Format { val name = "parquet" }
  // This Spark distribution bundles the avro classes inside spark-sql but
  // omits the DataSourceRegister service entry, so the "avro" alias fails
  // to resolve — the fully-qualified provider works.
  case object Avro extends Format {
    val name = "org.apache.spark.sql.avro.AvroFileFormat"
  }
  case object Csv extends Format { val name = "csv" }
  case object Orc extends Format { val name = "orc" }
}

/** A zone = a directory root + a storage format (variables.py:6-12). */
final case class Zone(root: String, format: Format) {
  def path(rel: String): String =
    if (rel.isEmpty) root else s"${root.stripSuffix("/")}/$rel"
}

/** Loader for the driver-generated test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table; normalizes `events.ts` (parquet TIMESTAMP(NANOS), read
    * as nanos LongType under spark.sql.legacy.parquet.nanosAsLong) back to
    * TimestampType at micro precision so downstream ops see a timestamp.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"${sfDir.stripSuffix("/")}/$name.parquet")
    if (name == "events" && df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType) {
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else df
  }
}
