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
      // an empty-diff batch publishes NO directory (skip-if-unchanged)
      // — absent feed dir ≡ empty change set to a tailing consumer
      if (!new java.io.File(s"$root/diff/batch=$batchId").isDirectory) Set.empty
      else spark.read.parquet(s"$root/diff/batch=$batchId")
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

    // skip-if-unchanged (the reference's persistence.md TODO): the
    // churn wave advanced versions (so its state snapshot publishes —
    // the watermark is recovery metadata) but shipped NO diff
    // directory: an absent feed dir is an empty change set
    assert(!new java.io.File(s"$root/diff/batch=2").exists,
      "empty-diff wave still published a diff directory")

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

  test("skip-if-unchanged: churn retry skips again, next diff unaffected") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "cdcskip")
      .toString
    def put(rows: Seq[CdcRow], id: Long): Unit =
      CdcStream.update(spark, root, "id", "version", "op", Seq("label"))(
        rows.toDF(), id)
    def stateIds: Set[String] = {
      val d = new java.io.File(s"$root/state")
      if (!d.isDirectory) Set.empty
      else d.listFiles().map(_.getName).filter(_.startsWith("v=")).toSet
    }
    put(Seq(CdcRow(1L, Some(10L), 1L, "upsert"),
      CdcRow(2L, Some(20L), 1L, "upsert")), 0L)
    val afterAdd = stateIds
    // a NO-ADVANCE batch (redelivered rows, no higher version): the
    // merged state would be byte-identical — publish nothing at all
    put(Seq(CdcRow(1L, Some(10L), 1L, "upsert")), 1L)
    assert(stateIds == afterAdd, "no-advance batch published a version")
    assert(!new java.io.File(s"$root/diff/batch=1").exists)
    // pure version CHURN (same label, higher version): the version
    // watermark moved → state publishes, but the value diff is empty
    // → no feed dir; the retry reproduces both decisions
    val churn = Seq(CdcRow(1L, Some(10L), 2L, "upsert"))
    put(churn, 1L)
    val afterChurn = stateIds
    assert(afterChurn.exists(_.startsWith("v=1_")),
      "churn batch must publish its version watermark")
    assert(!new java.io.File(s"$root/diff/batch=1").exists,
      "churn batch shipped a diff directory")
    put(churn, 1L)
    assert(!new java.io.File(s"$root/diff/batch=1").exists)
    // a later real change diffs against the churn-updated state: the
    // old_version it reports is the TRUE latest write (2, not 1)
    put(Seq(CdcRow(1L, Some(11L), 3L, "upsert")), 2L)
    val d2 = spark.read.parquet(s"$root/diff/batch=2")
      .select("id", "change", "old_label", "new_label", "old_version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(d2.toSeq == Seq((1L, "changed", 10L, 11L, 2L)))
  }

  test("equal-version conflicting write fails loudly; byte-identical " +
    "re-assertion stays a legal no-op") {
    // r13 (ADVICE r12): the strict version-advance gate used to
    // silently drop a row carrying the retained winner's version with
    // DIFFERENT attrs — version uniqueness per key is now a detected
    // hard input contract, not a trusted one.
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "cdcdup")
      .toString
    def put(rows: Seq[CdcRow], id: Long): Unit =
      CdcStream.update(spark, root, "id", "version", "op", Seq("label"))(
        rows.toDF(), id)
    put(Seq(CdcRow(1L, Some(10L), 1L, "upsert")), 0L)
    // same (id, version), identical payload — at-least-once
    // redelivery, must stay a silent no-op
    put(Seq(CdcRow(1L, Some(10L), 1L, "upsert")), 1L)
    assert(!new java.io.File(s"$root/diff/batch=1").exists)
    // same (id, version), DIFFERENT label — broken writer clock,
    // must refuse rather than drop one of two conflicting writes
    val eAttr = intercept[IllegalArgumentException] {
      put(Seq(CdcRow(1L, Some(99L), 1L, "upsert")), 2L)
    }
    assert(eAttr.getMessage.contains("unique"))
    // op flips count as payload conflicts too (upsert vs delete at
    // one version is the same broken clock)
    val eOp = intercept[IllegalArgumentException] {
      put(Seq(CdcRow(1L, Some(10L), 1L, "delete")), 2L)
    }
    assert(eOp.getMessage.contains("unique"))
    // the state survived the refusals: a real advance still works
    put(Seq(CdcRow(1L, Some(11L), 2L, "upsert")), 3L)
    val d = spark.read.parquet(s"$root/diff/batch=3")
      .select("id", "change", "new_label").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(d.toSeq == Seq((1L, "changed", 11L)))
  }
}
