package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  test("payload plumbing: binary column round-trips the text bytes") {
    val n = Multimodal.withPayload(Tables.documents(spark, sf))
      .select(col("doc_id"),
        decode(col("payload"), "UTF-8").as("back"))
      .join(Tables.documents(spark, sf), "doc_id")
      .where(col("back") =!= col("text")).count()
    assert(n == 0)
  }

  test("decode emits the typed contract; dims are the real decoded " +
    "raster's, not payload arithmetic") {
    val out = Multimodal.decodeQuery(spark, sf)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "channels", "checksum"))
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (w, h) = (r.getLong(2), r.getLong(3))
      assert(w >= 8 && w <= 20 && h >= 8 && h <= 14, s"dims $w x $h")
      assert(r.getLong(4) == 3L)
      assert(r.getLong(1) == w * h * 3L)
      assert(r.getString(5).length == 32)
    }
  }

  test("payloads are genuine PNGs and the decode is a pixel-exact " +
    "ImageIO round-trip") {
    val payloads = Multimodal.withImagePayload(
      spark, Tables.documents(spark, sf).limit(5)).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    payloads.foreach { case (id, bytes) =>
      // PNG magic — the payload really is an encoded image file
      assert(bytes.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47),
        s"doc $id payload is not a PNG")
      // an independent ImageIO read agrees with the operator's decode
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth >= 8)
    }
  }

  test("undecodable payload yields the sentinel row, not a crash") {
    import spark.implicits._
    val junk = Seq((1L, "not an image at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val r = Multimodal.decode(spark, junk).collect()
    assert(r.length == 1)
    assert(r(0).width == -1L && r(0).height == -1L && r(0).channels == -1L)
    assert(r(0).n_bytes == 19L && r(0).checksum.length == 32)
  }

  test("phash: same pattern seed collides, different seeds diverge") {
    val rows = Multimodal.phashQuery(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    // docs 0 and 50 share seed 0 → pixel-identical images → equal
    // hashes despite independent PNG encodes; doc 1 differs
    if (rows.contains(0L) && rows.contains(50L))
      assert(rows(0L) === rows(50L))
    if (rows.contains(0L) && rows.contains(1L))
      assert(rows(0L) !== rows(1L))
    rows.values.foreach { h =>
      assert(h.length === 64 && h.forall(c => c == '0' || c == '1'))
    }
  }

  test("format sniffer classifies by real magic bytes, not labels") {
    import spark.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    val crafted = Seq(
      (1L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A)),
      (2L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)),
      (3L, "GIF89a....".getBytes(UTF_8)),
      (4L, "%PDF-1.7".getBytes(UTF_8)),
      (5L, "RIFF....WAVE".getBytes(UTF_8)),
      (6L, "plain words".getBytes(UTF_8)),
      (7L, Array.emptyByteArray)
    ).toDF("doc_id", "payload")
    val got = graft.operators.Multimodal.sniffFormat(crafted)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "gif",
      4L -> "pdf", 5L -> "riff", 6L -> "raw", 7L -> "raw"))
    // and the surface query's even docs really decode as PNG (the
    // codec output carries the magic — the oracle's parity prediction
    // rests on this)
    val surface = graft.operators.Multimodal.formatSniffQuery(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(surface.forall { case (id, f) =>
      if (id % 2 == 0) f == "png" else f == "raw" })
  }

  test("phash dup groups cover every doc sharing a seed") {
    val dups = Multimodal.phashDupQuery(spark, sf).collect()
    // sf docs: doc_id mod 50 collides whenever the corpus has >50 docs
    val nDocs = Tables.documents(spark, sf).count()
    if (nDocs > 50) {
      assert(dups.nonEmpty)
      dups.foreach(r => assert(r.getLong(1) > 1L))
      assert(dups.map(_.getLong(1)).sum <= nDocs)
    }
  }
}
