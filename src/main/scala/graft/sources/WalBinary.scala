package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's BINARY on-disk WAL framing as a Spark source.
  *
  * The reference WAL is not plain text: `Persistence::writeWALLog`
  * writes a raw native-endian (x86 → little-endian) uint64 byte
  * length before every record, and the record itself is
  * `log_id|version|operation_type|json` plus a trailing '\n'
  * (reference persistence.cc:60-66; read back length-first at
  * :90-100). [[WalSource.parse]] handles the record text; this file
  * supplies the missing physical layer so a reference-produced WAL
  * file ingests byte-for-byte.
  *
  * Distribution model: frames forbid arbitrary mid-file splits, so a
  * SEGMENT FILE is the unit of parallelism — `binaryFile` yields one
  * row per segment and the frame decode runs where the bytes land
  * (the reference rotates `wal_log_<id>`; a production WAL directory
  * holds thousands of segments, which is plenty of splits).
  */
object WalBinary {

  /** Encode record lines into reference framing (fixture synthesis
    * and the write side of a round-trip): per record, little-endian
    * uint64 length of `line + "\n"`, then those bytes.
    */
  def frame(lines: Seq[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val len = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    lines.foreach { l =>
      val rec = (l + "\n").getBytes(UTF_8)
      len.clear(); len.putLong(rec.length.toLong)
      bos.write(len.array(), 0, 8)
      bos.write(rec)
    }
    bos.toByteArray
  }

  /** THE frame decoder — the single implementation of the physical
    * format, shared by the in-memory decoder ([[decodeFrames]]) and
    * the DSv2 streaming reader ([[WalFrameReader]]). A frame whose
    * length field is garbage, or whose bytes end short (torn tail
    * write), ends the scan — the reference reader likewise bails on
    * a short read rather than resynchronizing (persistence.cc:90).
    * Holds at most one record in memory.
    */
  private[sources] def frameIterator(in: java.io.InputStream): Iterator[String] =
    new Iterator[String] {
      private var nextRec: String = _
      private var done = false

      /** Read exactly `n` bytes, accumulating in bounded chunks: a
        * garbled length field must not allocate its CLAIMED size up
        * front (a few corrupt bytes could otherwise demand a ~2 GB
        * buffer and OOM the executor before EOF reveals the tear) —
        * memory grows only with bytes actually read.
        */
      private def readFully(n: Int): Option[Array[Byte]] = {
        val out = new java.io.ByteArrayOutputStream(math.min(n, 1 << 16))
        val chunk = new Array[Byte](math.min(n, 1 << 16))
        var remaining = n
        while (remaining > 0) {
          val r = in.read(chunk, 0, math.min(chunk.length, remaining))
          if (r < 0) return None
          out.write(chunk, 0, r)
          remaining -= r
        }
        Some(out.toByteArray)
      }

      private def advance(): Unit = {
        nextRec = null
        if (!done) {
          readFully(8) match {
            case None => done = true
            case Some(lenBytes) =>
              val n = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN)
                .getLong
              if (n < 0 || n > Int.MaxValue) done = true
              else readFully(n.toInt) match {
                case None => done = true
                case Some(rec) =>
                  val s = new String(rec, UTF_8)
                  nextRec = if (s.endsWith("\n")) s.dropRight(1) else s
              }
          }
        }
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): String = {
        val r = nextRec; advance(); r
      }
    }

  /** Decode one segment's bytes into record lines (in-memory form of
    * [[frameIterator]]).
    */
  def decodeFrames(bytes: Array[Byte]): Seq[String] =
    frameIterator(new java.io.ByteArrayInputStream(bytes)).toSeq

  /** Reference-format WAL segment files → DataFrame of record lines,
    * ready for [[WalSource.parse]].
    */
  def readFramed(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(decodeFrames _)
      .toDF("line")
  }

  /** Synthesize a reference-format segment from the deterministic
    * synthetic WAL, once per sf dir (atomic publish, keyed path).
    * Driver-side by necessity: a WAL segment is one sequential byte
    * stream — this is FIXTURE WRITING, not the read path under test.
    */
  private[sources] def materializedWal(s: SparkSession, dir: String): String = {
    val path = graft.IndexCache.dirFor(dir, "walbin").resolve("wal_log_1")
    if (!Files.exists(path)) {
      Files.createDirectories(path.getParent)
      val lines = WalSource.syntheticWal(s, dir).collect()
        .map(_.getString(0))
        .sortBy(_.split("\\|", 2)(0).toLong)
      val tmp = path.resolveSibling(s"wal_log_1.tmp${System.nanoTime()}")
      Files.write(tmp, frame(lines.toIndexedSeq))
      Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING)
    }
    path.toString
  }

  /** Replay a binary-framed WAL segment to LWW state — same logical
    * result as [[WalSource.replayQuery]], through the physical
    * reference format.
    */
  def binaryReplayQuery(s: SparkSession, dir: String): DataFrame =
    WalSource.replay(WalSource.parse(readFramed(s, materializedWal(s, dir))))

  /** Same replay through the DSv2 connector ([[WalDataSource]]) —
    * the format-registry route a Spark user would actually take:
    * `spark.read.format("graft-wal")`.
    */
  def dsv2ReplayQuery(s: SparkSession, dir: String): DataFrame =
    WalSource.replay(WalSource.parse(
      s.read.format("graft-wal").load(materializedWal(s, dir))))

  /** WAL RETENTION — delete segments a snapshot has made dead for
    * replay. The reference recovers as snapshot ⊎ WAL-tail-after-
    * `lastSnapshotID` (persistence.cc:140,156-158 snapshots_MaxLogID;
    * vector_database.cc:21 reloadDatabase) but never reclaims the
    * log; unbounded WAL growth is the first thing an operator hits.
    * A segment is dead iff its MAX log id ≤ the snapshot's covered
    * id — every frame in it is already folded into the snapshot.
    *
    * The per-segment max is computed DISTRIBUTED (binaryFile rows
    * decode where they land, one partial-agg per segment); only the
    * dead segment PATHS — segment-count-sized — collect to the
    * driver for deletion.
    *
    * Crash-safety / idempotence: deletion is the only mutation, and
    * replay stays correct at every intermediate state — a surviving
    * dead segment only re-applies entries the snapshot already
    * holds, and (version, log_id)-LWW makes re-application a no-op
    * (WalBinarySpec pins snapshot ⊎ post-vacuum tail ≡ full replay).
    * Re-running vacuum after a crash finishes the job.
    *
    * @return deleted segment paths
    */
  def vacuumSegments(s: SparkSession, walGlob: String,
                     upToLogId: Long): Seq[String] = {
    import s.implicits._
    val dead = s.read.format("binaryFile").load(walGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        decodeFrames(bytes).map { l =>
          (p, WalSource.headLogId(l).getOrElse(Long.MaxValue))
        }
      }
      .toDF("path", "log_id")
      .groupBy("path").agg(max("log_id").as("max_id"))
      .where(col("max_id") <= upToLogId)
      .select("path").as[String].collect().toIndexedSeq
    dead.foreach { p =>
      Files.deleteIfExists(Paths.get(new java.net.URI(p)))
    }
    dead
  }

  /** Rotated binary fixture (3 segments) carrying the tombstone wave
    * of [[WalSource.syntheticWalWithDeletes]] — the compaction input.
    * Same once-per-sf-dir atomic publish as [[materializedWal]]; the
    * `_done` marker and the `_tmp_` prefix are both invisible to
    * Spark's file index AND to the `wal_log_*` glob, so readers only
    * ever see whole segments.
    */
  private[sources] def materializedWalDeletes(s: SparkSession,
                                              dir: String): String = {
    val root = graft.IndexCache.dirFor(dir, "walbindel")
    val done = root.resolve("_done")
    if (!Files.exists(done)) {
      Files.createDirectories(root)
      val lines = WalSource.syntheticWalWithDeletes(s, dir).collect()
        .map(_.getString(0))
        .sortBy(_.split("\\|", 2)(0).toLong)
      val per = (lines.length + 2) / 3
      lines.grouped(per).zipWithIndex.foreach { case (seg, i) =>
        val tmp = root.resolve(s"_tmp_wal_log_${i + 1}")
        Files.write(tmp, frame(seg.toIndexedSeq))
        Files.move(tmp, root.resolve(s"wal_log_${i + 1}"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      Files.write(done, Array.emptyByteArray)
    }
    root.resolve("wal_log_*").toString
  }

  /** WAL COMPACTION — rewrite a segment directory down to its per-id
    * (version, log_id)-LWW winner records. The reference never
    * compacts (its answer is a full snapshot, persistence.cc:140);
    * compaction is the cheaper production move: replay cost drops
    * from total-writes to live-ids WITHOUT losing the log framing —
    * a compacted directory is still a valid WAL a plain replayer
    * (or the reference's own reader, persistence.cc:90) consumes.
    *
    * TOMBSTONE winners are KEPT as records, not dropped: a compacted
    * prefix must keep masking older versions when an uncompacted
    * tail (or a stale surviving segment — the vacuum crash window)
    * is concatenated after it; LWW replay then still erases the id.
    *
    * Distribution: one hash aggregation keyed by id (exactly the
    * replay exchange); output partitions are id-hash buckets and
    * each writes ONE segment executor-side — segment count is the
    * chosen parallelism, never corpus- or driver-sized. Writes are
    * tmp + atomic-move per segment; re-running after a crash
    * overwrites deterministically (same winners, same buckets), so
    * compaction is idempotent.
    */
  def compactSegments(s: SparkSession, walGlob: String, outDir: String,
                      nSegments: Int = 4): Unit = {
    import s.implicits._
    val parsed = readFramed(s, walGlob)
      .select(col("line"), split(col("line"), "\\|", 4).as("f"))
      .select(col("line"),
        col("f").getItem(0).cast("long").as("log_id"),
        col("f").getItem(1).cast("long").as("version"),
        col("f").getItem(2).as("op"),
        get_json_object(col("f").getItem(3), "$.id").cast("long").as("id"))
      .where(col("op").isin("upsert", "delete") && col("id").isNotNull)
    val winners = parsed.groupBy("id")
      .agg(max_by(struct(col("line"), col("log_id")),
        struct(col("version"), col("log_id"))).as("w"))
      .select(col("w.line").as("line"), col("w.log_id").as("log_id"),
        col("id"))
    val outAbs = Paths.get(outDir).toAbsolutePath
    Files.createDirectories(outAbs)
    val outStr = outAbs.toString
    winners.repartition(nSegments, col("id"))
      .sortWithinPartitions("log_id")
      .select("line").as[String]
      .foreachPartition { (it: Iterator[String]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val bytes = frame(it.toSeq)
        val base = Paths.get(outStr)
        val tmp = base.resolve(s"_tmp_compact_$pid")
        Files.write(tmp, bytes)
        Files.move(tmp, base.resolve(s"wal_compact_$pid"),
          StandardCopyOption.REPLACE_EXISTING)
        ()
      }
  }

  /** Registry surface: compact the rotated tombstone-wave fixture
    * once per sf dir, then tombstone-honoring replay of the
    * COMPACTED directory alone — live LWW state (id, int_field,
    * version), which must equal the same replay of the uncompacted
    * log (the oracle recomputes it from the raw record stream;
    * `n_log_entries` is deliberately absent — compaction's whole
    * point is collapsing it to 1).
    */
  def compactReplayQuery(s: SparkSession, dir: String): DataFrame = {
    val glob = materializedWalDeletes(s, dir)
    val outRoot = graft.IndexCache.dirFor(dir, "walcompact")
    val done = outRoot.resolve("_done")
    if (!Files.exists(done)) {
      compactSegments(s, glob, outRoot.toString)
      Files.write(done, Array.emptyByteArray)
    }
    WalSource.replayTombstones(WalSource.parse(
        readFramed(s, outRoot.resolve("wal_compact_*").toString)))
      .select("id", "int_field", "version")
      .orderBy("id")
  }
}
