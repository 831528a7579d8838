package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
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
import org.apache.spark.util.SerializableConfiguration

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
  * every Spark file source). The session's Hadoop configuration is
  * broadcast to the readers, so `spark.hadoop.*` settings (S3
  * credentials, endpoints) apply exactly as in built-in sources.
  *
  * Physical format per record (reference persistence.cc:60-66):
  * little-endian uint64 byte length, then `log_id|version|optype|
  * json\n`. A torn or garbled tail frame ends that segment's scan,
  * matching the reference reader's bail-on-short-read. The frame
  * decode itself is [[WalBinary.frameIterator]] — one implementation
  * shared with the in-memory decoder.
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

  /** Natural (numeric-aware) name ordering: alternating text/digit
    * runs, digit runs compared as integers — so `wal_log_10` sorts
    * AFTER `wal_log_9`. The reference rotates `wal_log_<id>` with a
    * monotonically increasing, NON-zero-padded id: plain lexicographic
    * ordering would place wal_log_10 below the wal_log_9 watermark
    * and silently lose every segment from 10 up.
    */
  def naturalCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      if (a(i).isDigit && b(j).isDigit) {
        val si = i; val sj = j
        while (i < a.length && a(i).isDigit) i += 1
        while (j < b.length && b(j).isDigit) j += 1
        val ra = a.substring(si, i)
        val rb = b.substring(sj, j)
        val c = BigInt(ra).compare(BigInt(rb))
        if (c != 0) return c
        // numerically-equal runs with different zero padding
        // (wal_log_01 vs wal_log_1) must NOT compare equal: the
        // streaming watermark's strict '>' filter would permanently
        // skip a later-arriving segment whose name ties it. Break the
        // tie on the raw digit substrings so distinct names form a
        // total order.
        val cl = ra.compareTo(rb)
        if (cl != 0) return cl
      } else {
        val c = a(i).compareTo(b(j))
        if (c != 0) return c
        i += 1; j += 1
      }
    }
    (a.length - i).compareTo(b.length - j)
  }

  private[sources] val NaturalOrdering: Ordering[String] =
    (a: String, b: String) => naturalCompare(a, b)
}

private[sources] class WalSegmentTable(path: String)
    extends Table with SupportsRead {
  import WalDataSource.{NaturalOrdering, naturalCompare}

  override def name(): String = s"graft-wal(`$path`)"
  override def schema(): StructType = WalDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  /** Visible segment files in natural name order (see
    * [[WalDataSource.naturalCompare]]) — streaming uses the name as
    * its watermark, so the listing order IS the stream order.
    */
  private def listSegments(hconf: SerializableConfiguration): Seq[String] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(hconf.value)
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
      .sortBy(f => new HPath(f).getName)(NaturalOrdering)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // session Hadoop conf captured on the driver, shipped to readers
    val hconf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    val readerFactory: PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(
            partition: InputPartition): PartitionReader[InternalRow] =
          new WalFrameReader(
            partition.asInstanceOf[WalSegmentPartition].file, hconf)
      }

    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = WalDataSource.Schema
      override def toBatch: Batch = this

      /** One partition per segment file — frames forbid mid-file
        * splits, so the segment is the unit of parallelism.
        */
      override def planInputPartitions(): Array[InputPartition] =
        listSegments(hconf)
          .map(f => WalSegmentPartition(f): InputPartition).toArray

      override def createReaderFactory(): PartitionReaderFactory =
        readerFactory

      /** Micro-batch mode: the offset is the natural-order NAME
        * watermark of the last fully-processed segment; each batch is
        * the set of newly-appeared segments above it. Segments must be
        * sealed before they appear (write-to-temp + rename, as the
        * fixture writers here do) — the frame decoder's torn-tail
        * handling makes a violated contract lose a tail record, not
        * corrupt one.
        */
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MicroBatchStream {
          // one LIST per trigger: latestOffset's directory listing is
          // reused by the planInputPartitions call that follows it
          // (object-store LIST calls are the hot cost of a short
          // trigger interval over thousands of segments)
          @volatile private var lastListing: (String, Seq[String]) = ("", Nil)

          override def initialOffset(): Offset = WalNameOffset("")

          override def latestOffset(): Offset = {
            val segs = listSegments(hconf)
            val mark =
              if (segs.isEmpty) "" else new HPath(segs.last).getName
            lastListing = (mark, segs)
            WalNameOffset(mark)
          }

          override def planInputPartitions(start: Offset,
                                           end: Offset): Array[InputPartition] = {
            val lo = start.asInstanceOf[WalNameOffset].watermark
            val hi = end.asInstanceOf[WalNameOffset].watermark
            val segs =
              if (lastListing._1 == hi) lastListing._2
              else listSegments(hconf)
            segs
              .filter { f =>
                val n = new HPath(f).getName
                naturalCompare(n, lo) > 0 && naturalCompare(n, hi) <= 0
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
}

private[sources] case class WalSegmentPartition(file: String)
    extends InputPartition

/** Streaming offset: natural-order segment-name watermark. */
private[sources] case class WalNameOffset(watermark: String) extends Offset {
  override def json(): String = "\"" + watermark + "\""
}

/** Streams one segment frame by frame via the shared
  * [[WalBinary.frameIterator]]; holds at most one record in memory.
  */
private[sources] class WalFrameReader(file: String,
                                      hconf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val path = new HPath(file)
  private val in = path.getFileSystem(hconf.value).open(path)
  private val frames = WalBinary.frameIterator(in)
  private var current: UTF8String = _

  override def next(): Boolean =
    if (frames.hasNext) {
      current = UTF8String.fromString(frames.next()); true
    } else false

  override def get(): InternalRow = new GenericInternalRow(Array[Any](current))

  override def close(): Unit = in.close()
}
