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
}
