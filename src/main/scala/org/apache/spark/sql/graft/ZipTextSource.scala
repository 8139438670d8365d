package org.apache.spark.sql.graft

import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 batch source reading TEXT MEMBERS OF ZIP ARCHIVES as a
  * table — the shape crawl/corpus dumps actually arrive in. One row per
  * archive member: (archive, member, n_bytes, text).
  *
  * `spark.read.format("org.apache.spark.sql.graft.ZipTextSource")
  *   .load(dir)` (or the `graft-zip` short name) scans every `*.zip`
  * under `dir`.
  *
  * Scale posture:
  *  - one input partition PER ARCHIVE — a 100 TB dump of many archives
  *    reads at full executor parallelism with no shuffle (zip central
  *    directories make a single archive inherently sequential; split
  *    further upstream, not here);
  *  - COLUMN PRUNING is real work avoidance: when `text` is not required
  *    (counts, member listings), entries are skipped with
  *    ZipInputStream.closeEntry — no decompression of the payload;
  *  - FILTER PUSHDOWN on `member` (equality / prefix) skips non-matching
  *    entries before any byte of them is decompressed;
  *  - the Hadoop configuration ships to executors via the same
  *    SerializableConfiguration broadcast Spark's own file sources use,
  *    so any Hadoop-compatible filesystem works.
  *
  * Cited reference behavior: the reference ingests zip archives by
  * downloading and extracting to storage before Spark ever reads them
  * (cloud-function main.py:14-31); this source makes the archive itself
  * the table, removing the extract-and-rewrite pass.
  */
class ZipTextSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-zip"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipTextSource.SCHEMA

  // Writes pass the incoming DataFrame's schema ((member, text) is
  // enough) instead of requiring the full read schema.
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ZipTextTable(properties.get("path"), schema)
}

object ZipTextSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))
}

private[graft] class ZipTextTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null && path.nonEmpty, "graft-zip needs a load path")
  override def name(): String = s"graft-zip:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZipScanBuilder(path,
      "permissive".equalsIgnoreCase(options.getOrDefault("mode", "failfast")),
      options.getOrDefault("maxFilesPerTrigger", "0").toInt)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new ZipWriteBuilder(path, info.schema(), info.queryId())
}

private[graft] class ZipScanBuilder(path: String, permissive: Boolean,
                                    maxFilesPerTrigger: Int = 0)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = ZipTextSource.SCHEMA
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept member-name equality/prefix filters (evaluated pre-decompress)
    * and archive-name filters (whole archives pruned at PLANNING time —
    * the non-matching file is never opened); everything else stays with
    * Spark as a post-scan filter.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("member", _: String) => true
      case StringStartsWith("member", _) => true
      case EqualTo("archive", _: String) => true
      case StringStartsWith("archive", _) => true
      case _ => false
    }
    pushed = accepted
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new ZipScan(path, required, pushed, permissive, maxFilesPerTrigger)
}

private[graft] class ZipScan(path: String, required: StructType,
                             pushed: Array[Filter],
                             permissive: Boolean,
                             maxFilesPerTrigger: Int = 0)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ZipMicroBatchStream(path, required, pushed, permissive,
      maxFilesPerTrigger)
  override def description(): String =
    s"ZipScan path=$path, ReadSchema: ${required.simpleString}, " +
      s"PushedMemberFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val status =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.getPath.getName.endsWith(".zip"))
      else Array(fs.getFileStatus(p))
    status.sortBy(_.getPath.toString)
      .map(_.getPath.toString)
      .filter(archiveOk)
      .map(f => ZipArchivePartition(f): InputPartition)
  }

  /** Archive-level pushed filters: applied to the file listing, so pruned
    * archives never become partitions (and are never opened).
    */
  private def archiveOk(file: String): Boolean = pushed.forall {
    case EqualTo("archive", v: String) => file == v
    case StringStartsWith("archive", p) => file.startsWith(p)
    case _ => true
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    ZipReaderFactory(required, pushed, conf, permissive)
  }
}

private[graft] case class ZipArchivePartition(file: String) extends InputPartition

private[graft] case class ZipReaderFactory(
    required: StructType, pushed: Array[Filter],
    conf: SerializableConfiguration,
    permissive: Boolean) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ZipPartitionReader(p.asInstanceOf[ZipArchivePartition].file,
      required, pushed, conf, permissive)
}

private[graft] class ZipPartitionReader(
    file: String, required: StructType, pushed: Array[Filter],
    conf: SerializableConfiguration,
    permissive: Boolean = false) extends PartitionReader[InternalRow] {

  private val needText = required.fieldNames.contains("text")
  // Streamed zips carry sizes in trailing data descriptors, where
  // ZipInputStream reports getSize = -1 — so n_bytes may force a
  // decompress too. Pure member/count scans still skip all payload bytes.
  private val needSize = required.fieldNames.contains("n_bytes")
  private val path = new Path(file)
  // Opened lazily on the first next() so that permissive mode also covers
  // open-time failures (an archive listed at planning time but deleted or
  // unreadable by read time) — an eager constructor open would fail the
  // task before the permissive catch is reachable.
  private var in: ZipInputStream = _
  private var row: InternalRow = _

  private def memberOk(name: String): Boolean = pushed.forall {
    case EqualTo("member", v: String) => name == v
    case StringStartsWith("member", p) => name.startsWith(p)
    case _ => true
  }

  // Spark does NOT re-apply pushed filters post-scan, so archive filters
  // must hold here too (the batch planner also prunes the listing; the
  // streaming path relies on this check alone).
  private val archiveMatches: Boolean = pushed.forall {
    case EqualTo("archive", v: String) => file == v
    case StringStartsWith("archive", p) => file.startsWith(p)
    case _ => true
  }

  override def next(): Boolean =
    // mode=permissive: a corrupt/truncated/vanished archive yields the
    // rows read so far and is then skipped — one bad dump file must not
    // kill a 100 TB ingest. IllegalArgumentException covers malformed
    // entry names (ZipInputStream throws it, not IOException, for bad
    // name encodings). Default (failfast) propagates the error.
    if (permissive)
      try nextImpl() catch {
        case _: java.io.IOException => false
        case _: IllegalArgumentException => false
      }
    else nextImpl()

  private def nextImpl(): Boolean = {
    if (!archiveMatches) return false
    if (in == null)
      in = new ZipInputStream(path.getFileSystem(conf.value).open(path))
    var entry = in.getNextEntry
    while (entry != null) {
      if (!entry.isDirectory && memberOk(entry.getName)) {
        // Decompress only when a payload-derived column is required —
        // closeEntry skips the remaining compressed bytes otherwise.
        val bytes: Array[Byte] =
          if (needText || (needSize && entry.getSize < 0)) {
            val buf = new ArrayBuffer[Byte]()
            val chunk = new Array[Byte](64 * 1024)
            var n = in.read(chunk)
            while (n >= 0) { buf ++= chunk.take(n); n = in.read(chunk) }
            buf.toArray
          } else null
        val values = required.fieldNames.map {
          case "archive" => UTF8String.fromString(file)
          case "member" => UTF8String.fromString(entry.getName)
          case "n_bytes" =>
            if (bytes != null) bytes.length.toLong else entry.getSize
          case "text" => UTF8String.fromBytes(bytes)
        }
        row = InternalRow.fromSeq(values.toIndexedSeq)
        in.closeEntry()
        return true
      }
      in.closeEntry()
      entry = in.getNextEntry
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = if (in != null) in.close()
}

/** Write side: each task streams its rows into one `_tmp-…` archive
  * (member name + deflated text), the driver commit renames temps to
  * `part-NNNNN.zip` — the classic temp-plus-rename protocol, so failed or
  * speculative tasks never surface partial archives. Overwrite mode
  * (SupportsTruncate) deletes the pre-existing archives at commit time,
  * after every new temp is fully written.
  *
  * Input schema needs `member` and `text` string columns (the read-side
  * `archive` / `n_bytes` are derived, not stored).
  */
private[graft] class ZipWriteBuilder(path: String, schema: StructType,
                                     queryId: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  import org.apache.spark.sql.connector.write._

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      require(schema.fieldNames.contains("member") &&
        schema.fieldNames.contains("text"),
        s"graft-zip write needs member+text columns, got ${schema.simpleString}")
      new ZipBatchWrite(path, schema.fieldIndex("member"),
        schema.fieldIndex("text"), doTruncate, queryId,
        new SerializableConfiguration(
          SparkSession.active.sparkContext.hadoopConfiguration))
    }
  }
}

private[graft] case class ZipCommitMessage(tmp: String, partitionId: Int)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[graft] class ZipBatchWrite(
    path: String, memberIdx: Int, textIdx: Int, truncate: Boolean,
    queryId: String, conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    ZipWriterFactory(path, memberIdx, textIdx, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.mkdirs(dir)
    if (truncate)
      fs.listStatus(dir).filter(_.getPath.getName.endsWith(".zip"))
        .foreach(s => fs.delete(s.getPath, false))
    // Committed names embed the write's queryId: append-mode jobs into a
    // directory that already holds archives must never collide with (and
    // silently replace — or, on HDFS, silently fail against) an earlier
    // job's part files. A rename that reports failure aborts the commit
    // loudly instead of dropping the partition.
    messages.collect { case ZipCommitMessage(tmp, pid) if tmp != null =>
      val dest = new Path(dir, f"part-$pid%05d-$queryId.zip")
      if (!fs.rename(new Path(tmp), dest))
        throw new java.io.IOException(
          s"graft-zip commit failed: rename $tmp -> $dest returned false" +
            " (destination exists or filesystem refused the move)")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.collect { case ZipCommitMessage(tmp, _) if tmp != null =>
      fs.delete(new Path(tmp), false)
    }
  }
}

private[graft] case class ZipWriterFactory(
    path: String, memberIdx: Int, textIdx: Int,
    conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new ZipDataWriter(path, partitionId, taskId, memberIdx, textIdx, conf)
}

private[graft] class ZipDataWriter(
    path: String, partitionId: Int, taskId: Long,
    memberIdx: Int, textIdx: Int, conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import java.util.zip.{ZipEntry, ZipOutputStream}

  // Lazy: empty partitions must not leave empty archives behind.
  private var tmp: Path = _
  private var out: ZipOutputStream = _

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      tmp = new Path(path, f"_tmp-part-$partitionId%05d-$taskId")
      val fs = tmp.getFileSystem(conf.value)
      fs.mkdirs(tmp.getParent)
      out = new ZipOutputStream(fs.create(tmp, true))
    }
    out.putNextEntry(new ZipEntry(row.getUTF8String(memberIdx).toString))
    if (!row.isNullAt(textIdx)) out.write(row.getUTF8String(textIdx).getBytes)
    out.closeEntry()
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (out != null) out.close()
    ZipCommitMessage(if (tmp == null) null else tmp.toString, partitionId)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    if (tmp != null) tmp.getFileSystem(conf.value).delete(tmp, false)
  }

  override def close(): Unit = ()
}

/** Streaming read: the archive directory as a micro-batch source — new
  * `*.zip` files appearing under the path are ingested in arrival batches
  * (file-source semantics for the archive format: an archive is immutable
  * once written, so "which files have been seen" IS the stream offset).
  * Offsets serialize the seen-file set; each batch plans one partition
  * per newly-arrived archive, reusing the batch reader (same pruning and
  * member-filter pushdown).
  */
case class ZipStreamOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    files.sorted.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object ZipStreamOffset {
  def fromJson(json: String): ZipStreamOffset = {
    // Minimal parser for the array-of-strings this source writes.
    val files = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(json)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      .toSeq
    ZipStreamOffset(files)
  }
}

private[graft] class ZipMicroBatchStream(
    path: String, required: StructType, pushed: Array[Filter],
    permissive: Boolean = false, maxFilesPerTrigger: Int = 0)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  // Trigger.AvailableNow: pin the drain target at trigger start — batches
  // then honor the per-batch admission limit until the pinned set is
  // consumed (without this, Spark's wrapper fetches everything in one
  // batch and the limit is moot).
  @volatile private var pinned: Option[Seq[String]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    pinned = Some(listArchives())

  /** maxFilesPerTrigger bounds how many new archives one micro-batch
    * admits — the backpressure knob for a directory where a whole day's
    * dump lands at once. Implemented through SupportsAdmissionControl so
    * AvailableNow still drains everything, just in bounded batches.
    */
  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[ZipStreamOffset].files.toSet
    val fresh = pinned.getOrElse(listArchives()).filterNot(seen).sorted
    val admitted = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    ZipStreamOffset((seen ++ admitted).toSeq.sorted)
  }

  private val conf = new SerializableConfiguration(
    SparkSession.active.sparkContext.hadoopConfiguration)

  private def listArchives(): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.getPath.getName.endsWith(".zip"))
      .map(_.getPath.toString).toSeq.sorted
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")
  override def initialOffset(): Offset = ZipStreamOffset(Seq.empty)
  override def deserializeOffset(json: String): Offset =
    ZipStreamOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[ZipStreamOffset].files.toSet
    end.asInstanceOf[ZipStreamOffset].files
      .filterNot(seen)
      .sorted
      .map(f => ZipArchivePartition(f): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZipReaderFactory(required, pushed, conf, permissive)
}
