package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.sources.{WalBinary, WalSource}

class WalBinarySpec extends SparkSuite {

  /** Hand-rolled reference framing (independent of WalBinary.frame):
    * raw little-endian uint64 length, then `record\n` bytes — the
    * exact byte stream persistence.cc:60-66 produces.
    */
  private def refFrame(records: Seq[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val bytes = (r + "\n").getBytes(UTF_8)
      val len = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(bytes.length.toLong)
      bos.write(len.array())
      bos.write(bytes)
    }
    bos.toByteArray
  }

  private val records = Seq(
    """1|1|upsert|{"id":7,"vectors":[0.1,0.2],"int_field":3,"indexType":"FLAT"}""",
    """2|1|upsert|{"id":8,"vectors":[0.3],"int_field":4,"indexType":"FLAT"}""",
    """3|2|upsert|{"id":7,"vectors":[0.5,0.6],"int_field":9,"indexType":"FLAT"}""")

  test("replays a byte-exact reference-format WAL file to LWW state") {
    val dir = Files.createTempDirectory("walbin")
    val f = dir.resolve("wal_log_1")
    Files.write(f, refFrame(records))
    try {
      val state = WalSource.replay(
        WalSource.parse(WalBinary.readFramed(spark, f.toString)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      // id 7: v2 wins with int_field 9 over 2 log entries; id 8: v1
      assert(state.toSet == Set((7L, 9L, 2L, 2L), (8L, 4L, 1L, 1L)))
    } finally {
      Files.deleteIfExists(f); Files.deleteIfExists(dir)
    }
  }

  test("frame/decodeFrames round-trip is identity") {
    assert(WalBinary.decodeFrames(WalBinary.frame(records)) == records)
  }

  test("torn tail frame ends the scan instead of corrupting records") {
    val whole = refFrame(records)
    // cut mid-way through the last record's bytes
    val torn = whole.take(whole.length - 5)
    assert(WalBinary.decodeFrames(torn) == records.dropRight(1))
    // garbage length field: first 8 bytes say "huge frame"
    val garbage = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(Long.MaxValue).putInt(42).array()
    assert(WalBinary.decodeFrames(garbage).isEmpty)
  }

  test("binary-framed replay equals the text-line replay") {
    val viaBinary = WalBinary.binaryReplayQuery(spark, sf).collect().toSeq
    val viaText = WalSource.replayQuery(spark, sf).collect().toSeq
    assert(viaBinary == viaText && viaBinary.nonEmpty)
  }

  test("vacuum deletes only snapshot-covered segments; replay composition survives") {
    import org.apache.spark.sql.functions._
    def seg(version: Long, logBase: Long): Seq[String] =
      (0 until 10).map { id =>
        s"""${logBase + id}|$version|upsert|{"id":$id,"int_field":${version * 10 + id},"indexType":"FLAT"}"""
      }
    val dir = Files.createTempDirectory("walvac")
    try {
      Files.write(dir.resolve("wal_log_1"), refFrame(seg(1, 1)))
      Files.write(dir.resolve("wal_log_2"), refFrame(seg(2, 11)))
      Files.write(dir.resolve("wal_log_3"), refFrame(seg(3, 21)))
      val glob = dir.toString + "/wal_log_*"
      def replayOf(where: org.apache.spark.sql.Column) =
        WalSource.replay(WalSource.parse(
          WalBinary.readFramed(spark, glob)).where(where))
      val full = replayOf(lit(true)).collect().toSeq
      // snapshot covers log ids <= 20 (segments 1 and 2)
      val snapshot = replayOf(col("log_id") <= 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      val deleted = WalBinary.vacuumSegments(spark, glob, upToLogId = 20L)
      assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet ==
        Set("wal_log_1", "wal_log_2"))
      assert(Files.exists(dir.resolve("wal_log_3")))
      // snapshot ⊎ post-vacuum tail ≡ the pre-vacuum full replay:
      // LWW on (version) per id, log-entry counts sum
      val tail = replayOf(lit(true))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      val composed = (snapshot ++ tail).groupBy(_._1).map { case (id, rows) =>
        val w = rows.maxBy(_._3)
        (id, w._2, w._3, rows.map(_._4).sum)
      }.toSeq.sortBy(_._1)
      assert(composed == full.map(r => {
        val row = r.asInstanceOf[org.apache.spark.sql.Row]
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      }))
      // idempotent: nothing more to delete at the same horizon
      assert(WalBinary.vacuumSegments(spark, glob, 20L).isEmpty)
    } finally {
      Seq("wal_log_1", "wal_log_2", "wal_log_3")
        .foreach(n => Files.deleteIfExists(dir.resolve(n)))
      Files.deleteIfExists(dir)
    }
  }

  /** Vacuum × tombstones. Once a segment carrying a delete is
    * vacuumed, the ONLY remaining witness of that deletion is the
    * snapshot — so the snapshot must retain version-carrying
    * tombstone rows, not just live rows. The sharpest case is a
    * stale-version upsert in the tail (version 2 at a log id past
    * the horizon) against a vacuumed v9 tombstone: (version, log_id)
    * LWW says the key stays dead, and a live-rows-only snapshot
    * would silently resurrect it. This spec pins the tombstone-
    * retaining composition ≡ full tombstone replay, through a
    * simulated vacuum crash (one dead segment survives) and after
    * the completed vacuum.
    */
  test("tombstones survive vacuum: snapshot with tombstones ⊎ tail ≡ full replay") {
    import org.apache.spark.sql.functions._
    val seg1 = (0 to 9).map { id =>
      s"""${1 + id}|1|upsert|{"id":$id,"int_field":${10 + id},"indexType":"FLAT"}"""
    }
    val seg2 = Seq(
      """11|2|delete|{"id":0}""",
      """12|3|upsert|{"id":0,"int_field":40,"indexType":"FLAT"}""", // churn inside horizon
      """13|2|delete|{"id":1}""",  // resurrected later, in the tail
      """14|2|delete|{"id":2}""",  // stays dead — tail never mentions it
      """15|2|upsert|{"id":3,"int_field":33,"indexType":"FLAT"}""",
      """16|9|delete|{"id":6}""")  // high-version tombstone (the trap)
    val seg3 = Seq(
      """21|3|upsert|{"id":1,"int_field":51,"indexType":"FLAT"}""", // resurrection
      """22|3|delete|{"id":3}""",                                    // tail delete of a live key
      """23|2|upsert|{"id":6,"int_field":62,"indexType":"FLAT"}""", // stale version: must NOT resurrect
      """24|2|upsert|{"id":5,"int_field":55,"indexType":"FLAT"}""")
    val dir = Files.createTempDirectory("walvacts")
    try {
      Files.write(dir.resolve("wal_log_1"), refFrame(seg1))
      Files.write(dir.resolve("wal_log_2"), refFrame(seg2))
      Files.write(dir.resolve("wal_log_3"), refFrame(seg3))
      val glob = dir.toString + "/wal_log_*"
      // per-id LWW winner INCLUDING op and ordering key — the
      // tombstone-retaining snapshot shape (and the composition unit)
      def winners(where: org.apache.spark.sql.Column): Map[Long, (Long, Long, String, Long, Long)] =
        WalSource.parse(WalBinary.readFramed(spark, glob)).where(where)
          .where(col("op").isin("upsert", "delete"))
          .groupBy("id")
          .agg(max_by(struct(col("int_field"), col("version"), col("op"),
              col("log_id")), struct(col("version"), col("log_id"))).as("w"),
            count(lit(1)).as("n"))
          .collect().map { r =>
            val w = r.getStruct(1)
            r.getLong(0) -> (if (w.isNullAt(0)) -1L else w.getLong(0),
              w.getLong(1), w.getString(2), w.getLong(3), r.getLong(2))
          }.toMap
      def live(ws: Map[Long, (Long, Long, String, Long, Long)]) =
        ws.collect { case (id, (v, ver, op, _, n)) if op != "delete" =>
          (id, v, ver, n)
        }.toSet
      val full = live(winners(lit(true)))
      // semantic pins on the full replay itself
      assert(!full.exists(t => Set(2L, 3L, 6L).contains(t._1)),
        "deleted keys (incl. the stale-version-upsert one) must be absent")
      assert(full.contains((1L, 51L, 3L, 3L)) && full.contains((0L, 40L, 3L, 3L)))
      val horizon = 16L
      val snapshot = winners(col("log_id") <= horizon) // tombstones retained
      assert(snapshot.exists { case (_, (_, _, op, _, _)) => op == "delete" })
      // winner by (version, log_id) decides value/op; the
      // n_log_entries cost metric SUMS across the composition parts
      def composed(tail: Map[Long, (Long, Long, String, Long, Long)]) =
        live((snapshot.keySet ++ tail.keySet).map { id =>
          val parts = snapshot.get(id).toSeq ++ tail.get(id).toSeq
          val w = parts.maxBy(t => (t._2, t._4))
          id -> (w._1, w._2, w._3, w._4, parts.map(_._5).sum)
        }.toMap)
      // simulated vacuum crash: one dead segment already deleted, one
      // survives — the surviving segment only re-applies covered
      // entries and LWW absorbs them (state exact; only the
      // n_log_entries cost metric would double-count, so compare
      // state fields here)
      Files.delete(dir.resolve("wal_log_1"))
      assert(composed(winners(lit(true))).map(t => (t._1, t._2, t._3)) ==
        full.map(t => (t._1, t._2, t._3)))
      // finish the vacuum: seg2 (max log 16 ≤ horizon) goes, seg3 stays
      val deleted = WalBinary.vacuumSegments(spark, glob, horizon)
      assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)) ==
        Seq("wal_log_2"))
      val tail = winners(lit(true))
      assert(!tail.contains(2L),
        "post-vacuum tail carries no witness of the dead key — only the snapshot does")
      // full composition contract, n_log_entries now exact too
      val comp = composed(tail)
      assert(comp == full)
      // a key alive ONLY via the snapshot (its sole upsert vacuumed)
      assert(!tail.contains(4L) && comp.contains((4L, 14L, 1L, 1L)))
      // the trap, stated directly: id 6's survival hinges on the
      // snapshot's v9 tombstone beating the tail's v2 upsert
      assert(snapshot(6L)._3 == "delete" && snapshot(6L)._2 == 9L)
      assert(tail(6L)._3 == "upsert" && !comp.exists(_._1 == 6L))
    } finally {
      Seq("wal_log_1", "wal_log_2", "wal_log_3")
        .foreach(n => Files.deleteIfExists(dir.resolve(n)))
      Files.deleteIfExists(dir)
    }
  }

  private def rmTree(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(c => rmTree(c))
    Files.deleteIfExists(p)
  }

  test("compaction: replay-equivalent, tombstones mask stale and later segments, idempotent") {
    val seg1 = (0 to 9).map { id =>
      s"""${1 + id}|1|upsert|{"id":$id,"int_field":${10 + id},"indexType":"FLAT"}"""
    }
    val seg2 = Seq(
      """11|2|delete|{"id":0}""",
      """12|3|upsert|{"id":0,"int_field":40,"indexType":"FLAT"}""",
      """13|2|delete|{"id":1}""",
      """14|9|delete|{"id":6}""", // high-version tombstone: the winner
      """15|2|upsert|{"id":3,"int_field":33,"indexType":"FLAT"}""")
    val dir = Files.createTempDirectory("walcomp")
    val out = Files.createTempDirectory("walcompout")
    val out2 = Files.createTempDirectory("walcompout2")
    val mix = Files.createTempDirectory("walcompmix")
    try {
      Files.write(dir.resolve("wal_log_1"), refFrame(seg1))
      Files.write(dir.resolve("wal_log_2"), refFrame(seg2))
      val glob = dir.toString + "/wal_log_*"
      def liveOf(path: String): Set[(Long, Long, Long)] =
        WalSource.replayTombstones(
            WalSource.parse(WalBinary.readFramed(spark, path)))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val full = liveOf(glob)
      assert(!full.exists(t => Set(1L, 6L).contains(t._1)) &&
        full.contains((0L, 40L, 3L)), "fixture sanity")

      WalBinary.compactSegments(spark, glob, out.toString, nSegments = 2)
      val cglob = out.toString + "/wal_compact_*"
      // 1. replay equivalence on the live state
      assert(liveOf(cglob) == full)
      // 2. exactly one record per id survives, tombstone winners AS
      //    RECORDS (ids 1 and 6 keep their delete lines)
      val clines = Files.list(out).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.startsWith("wal_compact_"))
        .flatMap(p => WalBinary.decodeFrames(Files.readAllBytes(p)))
      assert(clines.length == 10, "one winner record per id")
      assert(clines.count(_.contains("|delete|")) == 2)
      // 3. a STALE uncompacted segment surviving next to the
      //    compacted dir (the vacuum crash window) cannot resurrect:
      //    tombstone records keep masking under LWW
      Files.copy(out.resolve("wal_compact_0"), mix.resolve("wal_compact_0"))
      Files.copy(out.resolve("wal_compact_1"), mix.resolve("wal_compact_1"))
      Files.write(mix.resolve("wal_log_1"), refFrame(seg1)) // stale copy
      assert(liveOf(mix.toString + "/*") == full)
      // 4. a LATER tail appended after compaction composes exactly as
      //    it would over the uncompacted log
      val tail = Seq(
        """21|3|upsert|{"id":1,"int_field":51,"indexType":"FLAT"}""", // resurrect
        """22|4|delete|{"id":3}""")                                    // late delete
      Files.write(dir.resolve("wal_log_9"), refFrame(tail))
      Files.write(mix.resolve("wal_log_9"), refFrame(tail))
      assert(liveOf(mix.toString + "/*") == liveOf(glob))
      // 5. idempotent: compacting the compacted dir is a fixpoint
      WalBinary.compactSegments(spark, cglob, out2.toString, nSegments = 2)
      assert(liveOf(out2.toString + "/wal_compact_*") == full)
      val clines2 = Files.list(out2).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.startsWith("wal_compact_"))
        .flatMap(p => WalBinary.decodeFrames(Files.readAllBytes(p)))
      assert(clines2.sorted.toSeq == clines.sorted.toSeq)
    } finally {
      Seq(dir, out, out2, mix).foreach(rmTree)
    }
  }
}
