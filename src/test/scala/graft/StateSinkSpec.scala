package graft

import graft.streaming.{StateSink, WalEvent, WalStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming state sink must converge to the batch state: after
  * any number of micro-batches, the stored snapshot equals a full
  * batch aggregation of everything fed so far — the same ⊎
  * equivalence the snapshot/replay oracle pins, maintained
  * incrementally.
  */
class StateSinkSpec extends SparkSuite {

  test("foreachBatch state sink converges to the batch reference") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "statesink")
      .toString
    val all = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "value")
      .as[WalEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (first, second) = all.splitAt(all.length / 2)

    val stream = MemoryStream[WalEvent]
    val q = stream.toDS().toDF()
      .writeStream
      .foreachBatch(StateSink.update(spark, root) _)
      .start()
    try {
      stream.addData(first.toSeq); q.processAllAvailable()
      // mid-stream: state equals the batch aggregate of the prefix
      val mid = StateSink.readState(spark, root).get
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val midRef = first.groupBy(_.user_id).view.mapValues(_.length.toLong)
      assert(mid == midRef.toMap)

      stream.addData(second.toSeq); q.processAllAvailable()
      val fin = StateSink.readState(spark, root).get
        .select(col("user_id"), col("n_events"),
          round(col("sum_value"), 4).as("sv"),
          round(col("last_value"), 4).as("lv"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      val ref = WalStream.batchReference(Tables.events(spark, sf))
        .select(col("user_id"), col("n_events"),
          round(col("sum_value"), 4).as("sv"),
          round(col("last_value"), 4).as("lv"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(fin == ref)

      // retry idempotence: re-delivering the LAST batch (same
      // batchId, foreachBatch's failure contract) must not
      // double-count it
      StateSink.update(spark, root)(
        second.toSeq.toDF("event_id", "user_id", "ts", "value"), 1L)
      val retried = StateSink.readState(spark, root).get
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val refCounts = all.groupBy(_.user_id).view
        .mapValues(_.length.toLong).toMap
      assert(retried == refCounts, "retried batch was double-counted")

      // skip-if-unchanged (the reference's persistence.md TODO): an
      // EMPTY micro-batch publishes no version — the version count
      // equals the non-empty batches, and the readable state is
      // untouched
      def versionNames: Set[String] =
        new java.io.File(root).listFiles()
          .map(_.getName).filter(_.startsWith("v=")).toSet
      val beforeEmpty = versionNames
      StateSink.update(spark, root)(
        Seq.empty[WalEvent].toDF("event_id", "user_id", "ts", "value"), 2L)
      assert(versionNames == beforeEmpty,
        "empty batch still published a state version")
      val afterEmpty = StateSink.readState(spark, root).get
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(afterEmpty == refCounts)
    } finally {
      q.stop()
      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
    }
  }

  test("periodic trigger: N-batch bound, staleness bound, redelivery " +
    "idempotence, skip-if-unchanged composition") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "statesinkp")
      .toString
    try {
      val all = Tables.events(spark, sf)
        .select("event_id", "user_id", "ts", "value")
        .as[WalEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
      val waves = all.grouped(math.max(1, all.length / 4)).toSeq.take(4)
      var clock = 0L
      val tick = () => clock
      // r13 (reference persistence.md TODO #1): everyN=3, maxAge=1000
      def put(rows: Seq[WalEvent], id: Long): Unit =
        StateSink.updatePeriodic(spark, root, everyN = 3,
          maxAgeMs = 1000L, now = tick)(
          rows.toDF("event_id", "user_id", "ts", "value"), id)
      def versionIds: Seq[Long] =
        new java.io.File(root).listFiles()
          .map(_.getName).filter(_.startsWith("v="))
          .map(_.stripPrefix("v=").split("_")(0).toLong).toSeq.sorted
      def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.select("user_id", "n_events").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
      def refCounts(ws: Seq[Seq[WalEvent]]): Map[Long, Long] =
        ws.flatten.groupBy(_.user_id).view.mapValues(_.length.toLong).toMap

      // N-BATCH BOUND: batches 0,1 stage pending only; batch 2 is the
      // third pending batch -> forced publish folding all three
      put(waves(0).toSeq, 0L); clock = 10
      put(waves(1).toSeq, 1L); clock = 20
      assert(versionIds.isEmpty, "published before the N-batch bound")
      assert(StateSink.readState(spark, root).isEmpty)
      put(waves(2).toSeq, 2L); clock = 30
      assert(versionIds == Seq(2L), s"expected v=2, got $versionIds")
      assert(counts(StateSink.readState(spark, root).get) ==
        refCounts(waves.take(3).map(_.toSeq)),
        "published state != batch aggregate of the three waves")

      // TRIGGER-BATCH REDELIVERY: same batchId re-runs after the
      // publish - no second version, no double count
      put(waves(2).toSeq, 2L)
      assert(versionIds == Seq(2L), "redelivered trigger republished")
      assert(counts(StateSink.readState(spark, root).get) ==
        refCounts(waves.take(3).map(_.toSeq)))

      // STALENESS BOUND: one pending batch below the N bound
      // publishes once its age crosses maxAgeMs - surfaced by a later
      // EMPTY batch (the age gate must run even when the batch
      // contributes nothing)
      put(waves(3).toSeq, 3L)
      assert(versionIds == Seq(2L), "1 pending batch fired the N bound")
      // mid-window redelivery of the pending batch: content unchanged
      put(waves(3).toSeq, 3L)
      assert(versionIds == Seq(2L))
      clock += 1500
      put(Seq.empty[WalEvent], 4L)
      assert(versionIds == Seq(2L, 3L),
        s"stale pending did not publish: $versionIds")
      assert(counts(StateSink.readState(spark, root).get) ==
        refCounts(waves.map(_.toSeq)),
        "staleness publish drifted from the batch aggregate")

      // SKIP-IF-UNCHANGED: empty batch with nothing pending stages
      // nothing and publishes nothing, however stale the clock
      clock += 100000
      put(Seq.empty[WalEvent], 5L)
      assert(versionIds == Seq(2L, 3L),
        "empty batch with no pending still published")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
    }
  }
}
