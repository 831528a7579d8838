package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for reference-format WAL segments:
  * `spark.read.format("graft-wal").load(dir)` yields the record
  * lines, ready for [[WalSource.parse]].
  *
  * Versus the binaryFile + flatMap route ([[WalBinary.readFramed]]):
  * the reader STREAMS frames off the (HDFS/S3/local) input — a
  * segment never materializes in memory, so there is no 2 GB
  * per-file cap — and the source composes with the ordinary reader
  * API surface (format registry via DataSourceRegister, one
  * InputPartition per segment, `_`/`.`-prefixed files skipped like
  * every Spark file source).
  *
  * Physical format per record (reference persistence.cc:60-66):
  * little-endian uint64 byte length, then `log_id|version|optype|
  * json\n`. A torn or garbled tail frame ends that segment's scan,
  * matching the reference reader's bail-on-short-read.
  */
class WalDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-wal"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WalDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-wal requires a path")
    new WalSegmentTable(path)
  }
}

object WalDataSource {
  val Schema: StructType =
    StructType(Seq(StructField("line", StringType, nullable = false)))
}

private[sources] class WalSegmentTable(path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-wal(`$path`)"
  override def schema(): StructType = WalDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  /** Visible segment files, sorted by name. Segment names must be
    * lexicographically increasing across rotations (the standard
    * log-rotation convention; the reference's `wal_log_<id>` with a
    * monotonic id) — streaming uses the name as its watermark.
    */
  private def listSegments(): Seq[String] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(new Configuration())
    val root = fs.getFileStatus(p)
    val files =
      if (root.isDirectory) fs.listStatus(p).filter(_.isFile).toSeq
      else Seq(root)
    files
      .map(_.getPath.toString)
      .filterNot { f =>
        val n = new HPath(f).getName
        n.startsWith("_") || n.startsWith(".")
      }
      .sorted
  }

  private val readerFactory: PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] =
        new WalFrameReader(partition.asInstanceOf[WalSegmentPartition].file)
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = WalDataSource.Schema
      override def toBatch: Batch = this

      /** One partition per segment file — frames forbid mid-file
        * splits, so the segment is the unit of parallelism.
        */
      override def planInputPartitions(): Array[InputPartition] =
        listSegments()
          .map(f => WalSegmentPartition(f): InputPartition).toArray

      override def createReaderFactory(): PartitionReaderFactory =
        readerFactory

      /** Micro-batch mode: the offset is the lexicographic NAME
        * watermark of the last fully-processed segment; each batch is
        * the set of newly-appeared segments above it. Segments must be
        * sealed before they appear (write-to-temp + rename, as the
        * fixture writers here do) — the frame decoder's torn-tail
        * handling makes a violated contract lose a tail record, not
        * corrupt one.
        */
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MicroBatchStream {
          override def initialOffset(): Offset = WalNameOffset("")

          override def latestOffset(): Offset = {
            val segs = listSegments()
            if (segs.isEmpty) WalNameOffset("")
            else WalNameOffset(new HPath(segs.last).getName)
          }

          override def planInputPartitions(start: Offset,
                                           end: Offset): Array[InputPartition] = {
            val lo = start.asInstanceOf[WalNameOffset].watermark
            val hi = end.asInstanceOf[WalNameOffset].watermark
            listSegments()
              .filter { f =>
                val n = new HPath(f).getName
                n > lo && n <= hi
              }
              .map(f => WalSegmentPartition(f): InputPartition).toArray
          }

          override def createReaderFactory(): PartitionReaderFactory =
            readerFactory

          override def deserializeOffset(json: String): Offset =
            WalNameOffset(json.stripPrefix("\"").stripSuffix("\""))

          override def commit(end: Offset): Unit = ()
          override def stop(): Unit = ()
        }
    }
}

/** Streaming offset: lexicographic segment-name watermark. */
private[sources] case class WalNameOffset(watermark: String) extends Offset {
  override def json(): String = "\"" + watermark + "\""
}

private[sources] case class WalSegmentPartition(file: String)
    extends InputPartition

/** Streams one segment frame by frame; holds at most one record in
  * memory.
  */
private[sources] class WalFrameReader(file: String)
    extends PartitionReader[InternalRow] {

  private val path = new HPath(file)
  private val in = path.getFileSystem(new Configuration()).open(path)
  private var current: UTF8String = _
  private var done = false

  /** Read exactly `n` bytes; None on clean EOF at offset 0 of the
    * read, or on a short (torn) read.
    */
  private def readFully(n: Int): Option[Array[Byte]] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) return None
      off += r
    }
    Some(buf)
  }

  override def next(): Boolean = {
    if (done) return false
    readFully(8) match {
      case None => done = true; false
      case Some(lenBytes) =>
        val n = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN)
          .getLong
        // garbage length (negative / absurd) or torn record: bail on
        // this segment, like the reference's short-read handling
        if (n < 0 || n > Int.MaxValue) { done = true; false }
        else readFully(n.toInt) match {
          case None => done = true; false
          case Some(rec) =>
            val s = new String(rec, UTF_8)
            current = UTF8String.fromString(
              if (s.endsWith("\n")) s.dropRight(1) else s)
            true
        }
    }
  }

  override def get(): InternalRow = new GenericInternalRow(Array[Any](current))

  override def close(): Unit = in.close()
}
