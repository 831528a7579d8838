package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.streaming.SignatureMaintenance
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SignatureMaintenanceSpec extends SparkSuite {

  private def indexRows(p: String) = spark.read.parquet(p)
    .select("doc_id", "c", "band", "band_key")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    .toSet

  test("streamed upserts+tombstones maintain the signature index " +
      "≡ rebuild; same-batch delete wins by version") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val boot = docs.where(col("doc_id") % 3 === 0)
    val w1 = docs.where(col("doc_id") % 3 === 1)
      .as[(Long, String)].collect()
    val w2 = docs.where(col("doc_id") % 3 === 2)
      .as[(Long, String)].collect()
    // wave-2 tombstones: delete every 4th wave-1 doc
    val dead = w1.map(_._1).filter(_ % 4 == 0)
    // plus one same-batch upsert-then-delete pair: the delete carries
    // the higher version, so the doc must never enter the index
    val flash = w2.head._1 + 900000L

    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "sigstream")
    val idx = root.resolve("idx").toString
    val ckpt = root.resolve("ckpt").toString
    Dedup.buildSignatureIndex(boot, idx)

    val stream = MemoryStream[(Long, String, Long, String)]
    val q = SignatureMaintenance.attach(
      stream.toDF().toDF("doc_id", "text", "version", "op"), idx, ckpt)
    try {
      stream.addData(w1.map { case (id, t) => (id, t, 1L, "upsert") }.toSeq)
      q.processAllAvailable()
      stream.addData(
        w2.map { case (id, t) => (id, t, 2L, "upsert") }.toSeq ++
          dead.map(id => (id, null.asInstanceOf[String], 3L, "delete")) ++
          Seq((flash, "flash doc text here", 2L, "upsert"),
            (flash, null.asInstanceOf[String], 3L, "delete")))
      q.processAllAvailable()
    } finally q.stop()

    val survivors = docs.where(
      (col("doc_id") % 3 === 0 || col("doc_id") % 3 === 1 ||
        col("doc_id") % 3 === 2) &&
        !(col("doc_id") % 3 === 1 && col("doc_id") % 4 === 0))
    val full = root.resolve("full").toString
    Dedup.buildSignatureIndex(survivors, full)
    assert(indexRows(idx) == indexRows(full),
      "stream-maintained signature index drifted from rebuild")
    assert(!indexRows(idx).exists(_._1 == flash),
      "same-batch deleted doc leaked into the index")

    // the maintained index serves incremental dedup identically to a
    // fresh build: probe a batch of known near-dups (corpus docs with
    // one appended token) against both
    // deterministic probe selection (limit() without an order is
    // free to pick different rows per evaluation)
    val probe = survivors.where(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 700000L).as("doc_id"),
        concat(col("text"), lit(" extratoken")).as("text"))
    val got = Dedup.incrementalPairsIndexed(spark, survivors, idx, probe)
      .collect().map(_.toString).toSeq
    val want = Dedup.incrementalPairsIndexed(spark, survivors, full, probe)
      .collect().map(_.toString).toSeq
    assert(got == want && got.nonEmpty,
      "maintained index answers incremental dedup differently")
  }
}
