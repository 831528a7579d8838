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
}
