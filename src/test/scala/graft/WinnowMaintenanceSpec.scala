package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.streaming.WinnowMaintenance
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed winnowing-index loop must converge to a fresh batch
  * build under upserts + tombstones (including the same-batch
  * upsert-then-delete LWW case), and the maintained index must serve
  * incremental positional dedup identically to a rebuild.
  */
class WinnowMaintenanceSpec extends SparkSuite {

  private def indexRows(p: String) = spark.read.parquet(p)
    .select("doc_id", "fp").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed upserts+tombstones maintain the winnowing index " +
      "≡ rebuild; same-batch delete wins by version") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val boot = docs.where(col("doc_id") % 3 === 0)
    val w1 = docs.where(col("doc_id") % 3 === 1)
      .as[(Long, String)].collect()
    val w2 = docs.where(col("doc_id") % 3 === 2)
      .as[(Long, String)].collect()
    val dead = w1.map(_._1).filter(_ % 4 == 0)
    val flash = w2.head._1 + 900000L

    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "winstream")
    val idx = root.resolve("idx").toString
    val ckpt = root.resolve("ckpt").toString
    Dedup.buildWinnowIndex(boot, idx)

    val stream = MemoryStream[(Long, String, Long, String)]
    val q = WinnowMaintenance.attach(
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
      !(col("doc_id") % 3 === 1 && col("doc_id") % 4 === 0))
    val full = root.resolve("full").toString
    Dedup.buildWinnowIndex(survivors, full)
    assert(indexRows(idx) == indexRows(full),
      "stream-maintained winnowing index drifted from rebuild")
    assert(!indexRows(idx).exists(_._1 == flash),
      "same-batch deleted doc leaked into the index")

    // the maintained index answers incremental lookups identically
    val probe = survivors.where(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 700000L).as("doc_id"),
        concat(col("text"), lit(" extratoken")).as("text"))
    val got = Dedup.winnowIncremental(spark, idx, probe)
      .collect().map(_.toString).toSeq
    val want = Dedup.winnowIncremental(spark, full, probe)
      .collect().map(_.toString).toSeq
    assert(got == want, "maintained index answers lookups differently")
  }
}
