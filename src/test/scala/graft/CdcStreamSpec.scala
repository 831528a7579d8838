package graft

import graft.operators.Upsert
import graft.streaming.CdcStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class CdcRow(id: Long, label: Option[Long], version: Long, op: String)

/** The streaming change feed must ship exactly the batch diff: wave
  * v's emitted change set equals `Upsert.snapshotDiff(v-1, v)` — the
  * oracled batch operator — for every wave, redelivery replaces
  * rather than double-ships, and the maintained winner state's
  * visible slice converges to the LWW tombstone query.
  */
class CdcStreamSpec extends SparkSuite {

  private val diffCols = Seq("id", "change", "old_label", "new_label",
    "old_version", "new_version")

  test("per-wave CDC diff ≡ batch snapshotDiff; redelivery exact-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark

    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "cdc")
      .toString
    val log = Upsert.tombstoneLog(spark, sf)
    val waves = (1L to 6L).map { v =>
      log.where(col("version") === v)
        .collect()
        .map(r => CdcRow(r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          r.getLong(2), r.getString(3)))
        .toSeq
    }

    val stream = MemoryStream[CdcRow]
    val q = CdcStream.attach(stream.toDS().toDF(), root,
      "id", "version", "op", Seq("label"))
    try {
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
    } finally q.stop()

    def emitted(batchId: Long): Set[String] =
      spark.read.parquet(s"$root/diff/batch=$batchId")
        .select(diffCols.map(col): _*)
        .collect().map(_.toString).toSet
    def reference(v: Long): Set[String] =
      Upsert.snapshotDiff(log, "id", "version", "op", Seq("label"),
          vOld = v - 1, vNew = v)
        .select(diffCols.map(col): _*)
        .collect().map(_.toString).toSet

    // batch b carried version b+1; its diff must equal the batch
    // operator diffing the two log prefixes (v-1, v) — including
    // wave 1 against the empty state (everything `added`)
    (1L to 6L).foreach { v =>
      assert(emitted(v - 1) == reference(v),
        s"wave $v diff drifted from snapshotDiff(${v - 1}, $v)")
      // wave 3 RE-ASSERTS wave 2's values (the planted no-change
      // rows): value semantics must ship NOTHING for it — version
      // churn alone is not a change — and something for every other
      if (v == 3L) assert(emitted(v - 1).isEmpty,
        "re-assertion wave shipped spurious changes")
      else assert(emitted(v - 1).nonEmpty, s"wave $v shipped no changes")
    }

    // redelivery of the last wave (same batchId, foreachBatch's
    // failure contract): diff content identical, not doubled
    val before = emitted(5L)
    CdcStream.update(spark, root, "id", "version", "op", Seq("label"))(
      waves.last.toDF(), 5L)
    assert(emitted(5L) == before, "redelivered diff drifted")

    // the winner state's visible slice converges to the oracled LWW
    val latestState = new java.io.File(s"$root/state").listFiles().toSeq
      .filter(f => f.getName.startsWith("v=") &&
        new java.io.File(f, "_SUCCESS").exists)
      .maxBy { f =>
        val Array(b, a) = f.getName.stripPrefix("v=").split("_", 2)
        (b.toLong, a.toLong)
      }
    val visible = spark.read.parquet(latestState.toString)
      .where(col("op") =!= "delete")
      .select("id", "label", "version")
      .collect().map(_.toString).toSet
    val lww = Upsert.deleteQuery(spark, sf)
      .collect().map(_.toString).toSet
    assert(visible == lww, "state visible slice != LWW query")
  }
}
