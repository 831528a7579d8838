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
}
