package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
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
    // admission control: byte budget per micro-batch (frame-aligned,
    // ≥1 frame per trigger so a single oversized frame cannot stall)
    val maxBytesPerTrigger: Option[Long] =
      Option(options.get("maxBytesPerTrigger")).map(_.toLong)
    val readerFactory: PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(
            partition: InputPartition): PartitionReader[InternalRow] = {
          val p = partition.asInstanceOf[WalSegmentPartition]
          new WalFrameReader(p.file, p.startByte, p.endByte, hconf)
        }
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
          .map(f =>
            WalSegmentPartition(f, 0L, Long.MaxValue): InputPartition)
          .toArray

      override def createReaderFactory(): PartitionReaderFactory =
        readerFactory

      /** Micro-batch mode: the offset is (segment NAME in natural
        * order, frame-aligned BYTE position within it) — the position
        * lets the newest segment GROW IN PLACE between triggers, the
        * reference's actual write pattern (persistence.cc appends to
        * wal_log_<id> until rotation; a name-only watermark could
        * only ship whole sealed segments). Contract: only the
        * natural-order-LAST segment may be appended to; earlier
        * segments are sealed by rotation. The end position is always
        * advanced to a FRAME boundary (header-skip scan over only the
        * newly appended bytes, memoized across triggers), so a batch
        * never splits a frame and a torn in-progress tail write is
        * simply left for the next trigger. With
        * `maxBytesPerTrigger` set, the stream advertises
        * [[SupportsAdmissionControl]] and a backlog (e.g. everything
        * written during downtime) drains as bounded, individually
        * checkpointed micro-batches instead of one all-or-nothing
        * batch.
        */
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MicroBatchStream with SupportsAdmissionControl {
          // one LIST per trigger: latestOffset's directory listing is
          // reused by the planInputPartitions call that follows it
          // (object-store LIST calls are the hot cost of a short
          // trigger interval over thousands of segments)
          @volatile private var lastListing: (String, Seq[String]) = ("", Nil)
          // incremental frame-alignment memo: (segment name, greatest
          // known frame boundary). The header scan for a grown
          // segment resumes here instead of at byte 0 — O(new bytes)
          // per trigger, not O(file)
          @volatile private var alignMemo: (String, Long) = ("", 0L)

          override def initialOffset(): Offset = WalSegmentOffset("", 0L)

          /** Greatest frame boundary in [from, min(len, cap)) of `p`.
            * `admitFirst` lets the first frame overrun the cap (never
            * the file) — the ≥1-frame-per-trigger progress guarantee
            * under a byte budget smaller than one frame.
            */
          private def alignedEnd(p: HPath, from: Long,
                                 cap: Long = Long.MaxValue,
                                 admitFirst: Boolean = false): Long = {
            val fs = p.getFileSystem(hconf.value)
            val len = fs.getFileStatus(p).getLen
            if (from + 8 > len) return from
            val in = fs.open(p)
            try {
              var pos = from
              var first = true
              val hdr = new Array[Byte](8)
              var done = false
              while (!done && pos + 8 <= len) {
                in.seek(pos)
                var off = 0
                while (!done && off < 8) {
                  val r = in.read(hdr, off, 8 - off)
                  if (r < 0) done = true else off += r
                }
                if (!done) {
                  val n = java.nio.ByteBuffer.wrap(hdr)
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
                  // same garbled-length bail as the frame decoder
                  if (n < 0 || n > Int.MaxValue || pos + 8 + n > len)
                    done = true
                  else if (pos + 8 + n > cap && !(first && admitFirst))
                    done = true
                  else { pos += 8 + n; first = false }
                }
              }
              pos
            } finally in.close()
          }

          /** All available data: end of the newest segment (frame
            * aligned) — the unbounded end the pre-admission-control
            * stream always returned.
            */
          private def unboundedEnd(segs: Seq[String]): WalSegmentOffset =
            if (segs.isEmpty) WalSegmentOffset("", 0L)
            else {
              val lastPath = new HPath(segs.last)
              val name = lastPath.getName
              val from = if (alignMemo._1 == name) alignMemo._2 else 0L
              val pos = alignedEnd(lastPath, from)
              alignMemo = (name, pos)
              WalSegmentOffset(name, pos)
            }

          /** End offset after spending a byte budget from `lo`:
            * whole sealed segments are admitted by LENGTH (no frame
            * walk — rotation seals on a frame boundary, and a torn
            * sealed tail decodes to nothing), the segment the budget
            * lands in is cut at a frame boundary within it. After
            * downtime the backlog therefore drains as a sequence of
            * bounded batches, each individually checkpointed —
            * instead of one all-or-nothing batch over everything
            * written since (the r4 verdict's admission-control gap;
            * the reference replays its whole tail in one go,
            * vector_database.cc:21, but it is a single-node store).
            */
          private def boundedEnd(segs: Seq[String], lo: WalSegmentOffset,
                                 cap: Long): WalSegmentOffset = {
            var budget = cap
            var endName = lo.name
            var endPos = lo.pos
            var consumed = false
            val it = segs.iterator
            while (it.hasNext && budget > 0) {
              val f = it.next()
              val p = new HPath(f)
              val n = p.getName
              val cmp = if (lo.name.isEmpty) 1 else naturalCompare(n, lo.name)
              if (cmp >= 0) {
                val from = if (cmp == 0) lo.pos else 0L
                val fs = p.getFileSystem(hconf.value)
                val len = fs.getFileStatus(p).getLen
                if (from < len) {
                  val isLast = !it.hasNext
                  if (!isLast && len - from <= budget) {
                    endName = n; endPos = len
                    budget -= (len - from); consumed = true
                  } else {
                    // budget lands inside this segment, or it is the
                    // growing tail (which always needs the frame walk)
                    val hardCap =
                      if (budget >= len - from) len else from + budget
                    val memoFrom =
                      if (alignMemo._1 == n && alignMemo._2 >= from &&
                          alignMemo._2 <= hardCap) alignMemo._2
                      else from
                    val pos = alignedEnd(p, memoFrom, hardCap,
                      admitFirst = !consumed)
                    alignMemo = (n, pos)
                    if (pos > from) {
                      endName = n; endPos = pos
                      budget -= (pos - from); consumed = true
                    }
                    // stopped short of EOF (budget or torn tail):
                    // later segments belong to later batches
                    if (pos < len || budget <= 0)
                      return WalSegmentOffset(endName, endPos)
                  }
                }
              }
            }
            WalSegmentOffset(endName, endPos)
          }

          override def getDefaultReadLimit: ReadLimit =
            maxBytesPerTrigger.map(b => WalMaxBytes(b): ReadLimit)
              .getOrElse(ReadLimit.allAvailable())

          override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
            val segs = listSegments(hconf)
            val off = limit match {
              case WalMaxBytes(cap) =>
                boundedEnd(segs, start.asInstanceOf[WalSegmentOffset], cap)
              case _ => unboundedEnd(segs)
            }
            lastListing = (off.json(), segs)
            off
          }

          /** Kept for the plain-MicroBatchStream contract; the engine
            * routes through latestOffset(start, limit) when the source
            * advertises SupportsAdmissionControl.
            */
          override def latestOffset(): Offset = {
            val segs = listSegments(hconf)
            val off = unboundedEnd(segs)
            lastListing = (off.json(), segs)
            off
          }

          override def planInputPartitions(start: Offset,
                                           end: Offset): Array[InputPartition] = {
            val lo = start.asInstanceOf[WalSegmentOffset]
            val hi = end.asInstanceOf[WalSegmentOffset]
            val segs =
              if (lastListing._1 == hi.json()) lastListing._2
              else listSegments(hconf)
            segs.flatMap { f =>
              val n = new HPath(f).getName
              val cmpLo = naturalCompare(n, lo.name)
              val cmpHi = naturalCompare(n, hi.name)
              if (cmpLo < 0 || cmpHi > 0) None
              else {
                // a sealed middle segment reads to EOF; the batch's
                // end segment stops at the frame-aligned end position;
                // the start segment resumes past its consumed bytes
                val from = if (cmpLo == 0) lo.pos else 0L
                val until = if (cmpHi == 0) hi.pos else Long.MaxValue
                if (from >= until) None
                else Some(WalSegmentPartition(f, from, until): InputPartition)
              }
            }.toArray
          }

          override def createReaderFactory(): PartitionReaderFactory =
            readerFactory

          override def deserializeOffset(json: String): Offset =
            WalSegmentOffset.fromJson(json)

          override def commit(end: Offset): Unit = ()
          override def stop(): Unit = ()
        }
    }
  }
}

private[sources] case class WalSegmentPartition(file: String,
                                                startByte: Long,
                                                endByte: Long)
    extends InputPartition

/** Byte-budget [[ReadLimit]] for the graft-wal stream — the analog of
  * FileStreamSource's maxFilesPerTrigger, in bytes because the WAL's
  * unit of arrival is the frame, not the file (the newest segment
  * grows in place). Only this source consumes it, so a plain marker
  * class satisfies the (evolving) ReadLimit contract.
  */
private[sources] case class WalMaxBytes(bytes: Long) extends ReadLimit {
  require(bytes > 0, "maxBytesPerTrigger must be positive")
}

/** Streaming offset: (natural-order segment name, frame-aligned byte
  * position consumed within it).
  */
private[sources] case class WalSegmentOffset(name: String, pos: Long)
    extends Offset {
  override def json(): String = s"""{"name":"$name","pos":$pos}"""
}

private[sources] object WalSegmentOffset {
  private val Pat = """\{"name":"(.*)","pos":(\d+)\}""".r
  def fromJson(json: String): WalSegmentOffset = json match {
    case Pat(n, p) => WalSegmentOffset(n, p.toLong)
    // pre-(name,pos) checkpoints stored the bare name — resume at its
    // end-of-known-frames by treating the whole segment as consumed
    // is NOT safe; a plain name means "segment fully processed", so
    // restart from its successor: pos = MaxValue reproduces that
    case _ =>
      WalSegmentOffset(json.stripPrefix("\"").stripSuffix("\""),
        Long.MaxValue)
  }
}

/** Streams one segment's byte range [startByte, endByte) frame by
  * frame via the shared [[WalBinary.frameIterator]]; holds at most
  * one record in memory. Both bounds are frame-aligned by the
  * planner; the limit stream turns `endByte` into an EOF the decoder
  * already handles, so an in-progress append past the batch's end
  * position is invisible to this batch.
  */
private[sources] class WalFrameReader(file: String,
                                      startByte: Long,
                                      endByte: Long,
                                      hconf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val path = new HPath(file)
  private val in = path.getFileSystem(hconf.value).open(path)
  if (startByte > 0) in.seek(startByte)
  private val frames = WalBinary.frameIterator(
    if (endByte == Long.MaxValue) in
    else new BoundedStream(in, endByte - startByte))
  private var current: UTF8String = _

  override def next(): Boolean =
    if (frames.hasNext) {
      current = UTF8String.fromString(frames.next()); true
    } else false

  override def get(): InternalRow = new GenericInternalRow(Array[Any](current))

  override def close(): Unit = in.close()
}

/** Presents EOF after `remaining` bytes of the underlying stream —
  * how a reader honors a frame-aligned batch end position.
  */
private[sources] class BoundedStream(in: java.io.InputStream,
                                     private var remaining: Long)
    extends java.io.InputStream {
  override def read(): Int =
    if (remaining <= 0) -1
    else {
      val r = in.read()
      if (r >= 0) remaining -= 1
      r
    }
  override def read(b: Array[Byte], off: Int, len: Int): Int =
    if (remaining <= 0) -1
    else {
      val r = in.read(b, off, math.min(len.toLong, remaining).toInt)
      if (r > 0) remaining -= r
      r
    }
}
