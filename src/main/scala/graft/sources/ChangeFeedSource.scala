package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.Cdc

/** DSv2 micro-batch streaming source for change-record feeds (S6) —
  * the connector shape a live LogMiner source slots into (reference:
  * mine-next-window loop `module/migrate/sql/oracle/o2m/incr.go:
  * 249-505`, `V$LOGMNR_CONTENTS` scan `database/oracle/all.go:
  * 144-176`).
  *
  * The feed is a directory of append-only files of CSV change lines
  * `scn,seq,op,table,key,value` — each file one mined log window,
  * named in increasing order (redo sequence numbers). Offsets are
  * lexicographic file-NAME watermarks ([[FileNameOffset]]), so the
  * streaming checkpoint replays exactly-once per window: a restart
  * resumes after the committed name, a late file sorting below the
  * watermark can never shift what committed offsets refer to, and a
  * re-delivered window never double-applies (the engine-level
  * (scn,seq) guard in [[Cdc.streamApplyGuarded]] covers re-MINED
  * windows, which carry new names).
  *
  * Against a live Oracle the only part that changes is
  * [[ChangeFeedStream.latestOffset]] + the reader: instead of listing
  * files, start LogMiner over the next log window and read
  * V$LOGMNR_CONTENTS; offsets become SCN ranges. The plumbing —
  * Table/Scan/MicroBatchStream/PartitionReader, offset json,
  * commit — is exactly this.
  */
class ChangeFeedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Cdc.changeSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChangeFeedTable(properties.get("path"))
}

final class ChangeFeedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"change_feed($path)"
  override def schema(): StructType = Cdc.changeSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = Cdc.changeSchema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream = new ChangeFeedStream(path)
      }
    }
}

/** Offset = lexicographic high-watermark: the NAME of the last window
  * file ingested ("" before any). Names are the stable identity —
  * positional indices into a re-computed listing would shift if a
  * file ever landed sorting before the committed position, silently
  * skipping one window and double-delivering another. With a name
  * watermark, windows must arrive in increasing name order (exactly
  * how redo logs carry increasing sequence numbers); a violator is
  * ignored rather than corrupting committed offsets.
  */
final case class FileNameOffset(lastName: String) extends Offset {
  override def json(): String = lastName
}

final class ChangeFeedStream(path: String) extends MicroBatchStream {
  // the SESSION's Hadoop configuration — a bare new Configuration()
  // would drop spark.hadoop.* settings (object-store credentials,
  // defaultFS), breaking any non-local feed path
  private val hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration

  private def listFiles(): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
        && !st.getPath.getName.startsWith("."))
      .map(_.getPath).sortBy(_.getName)
  }

  override def initialOffset(): Offset = FileNameOffset("")
  override def latestOffset(): Offset = {
    val files = listFiles()
    FileNameOffset(if (files.isEmpty) "" else files.last.getName)
  }
  override def deserializeOffset(json: String): Offset =
    FileNameOffset(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[FileNameOffset].lastName
    val e = end.asInstanceOf[FileNameOffset].lastName
    // one partition per mined window file in (start, end] — windows
    // are independent, so they read concurrently; intra-window order
    // is restored downstream by (scn, seq)
    listFiles()
      .filter(p => p.getName > s && p.getName <= e)
      .map(p => ChangeFeedPartition(p.toString): InputPartition).toArray
  }

  // Configuration isn't Serializable: capture the entries ONCE (not
  // per micro-batch) and ship them; readers rebuild lazily per
  // executor, not per file
  private lazy val confEntries: Seq[(String, String)] =
    hadoopConf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toSeq

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeFeedReaderFactory(confEntries)
}

final case class ChangeFeedPartition(file: String) extends InputPartition

final class ChangeFeedReaderFactory(confEntries: Seq[(String, String)])
    extends PartitionReaderFactory {
  // one rebuild per deserialized factory instance (per executor),
  // shared by all its partition readers
  @transient private lazy val conf: Configuration = {
    val c = new Configuration(false)
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ChangeFeedPartition].file
    new PartitionReader[InternalRow] {
      private val p = new Path(file)
      private val in = p.getFileSystem(conf).open(p)
      private val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      private var current: InternalRow = _

      override def next(): Boolean = {
        val line = reader.readLine()
        if (line == null || line.isEmpty) { current = null; line != null && next() }
        else {
          // scn,seq,op,table,key,value — values are machine-written,
          // no quoting needed (a real LogMiner reader parses SQL_REDO
          // instead; see Cdc.c5RedoParse)
          val f = line.split(",", -1)
          current = new GenericInternalRow(Array[Any](
            f(0).toLong, f(1).toLong,
            UTF8String.fromString(f(2)), UTF8String.fromString(f(3)),
            f(4).toLong,
            if (f(5).isEmpty || f(5) == "NULL") null else f(5).toDouble))
          true
        }
      }
      override def get(): InternalRow = current
      override def close(): Unit = reader.close()
    }
  }
}
