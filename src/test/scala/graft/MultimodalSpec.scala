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

  test("decode emits the typed contract with deterministic fields") {
    val out = Multimodal.decodeQuery(spark, sf)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "channels", "checksum"))
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) == 64L + n % 577L)
      assert(r.getLong(4) == 3L)
      assert(r.getString(5).length == 32)
    }
  }

  test("decode checksum equals expression-level md5 of the payload") {
    val viaExpr = Multimodal.withPayload(Tables.documents(spark, sf))
      .select(col("doc_id"), md5(col("payload")).as("m")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val viaDecode = Multimodal.decodeQuery(spark, sf)
      .select("doc_id", "checksum").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(viaDecode == viaExpr)
  }
}
