package graft

import graft.streaming.WalEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Native session_window sessionization under Structured Streaming:
  * with a watermark, session state merges as events arrive and a
  * session is emitted exactly once, when the watermark passes its
  * end — unbounded user streams sessionize with bounded state. The
  * batch twin (BatchTwins.sessionWindowQuery) is under the DuckDB
  * oracle; this spec proves the stream converges to it.
  */
class SessionWindowSpec extends SparkSuite {

  test("append-mode session windows finalize and equal the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "value")
      .as[WalEvent].collect().sortBy(_.ts.getTime)

    val stream = MemoryStream[WalEvent]
    val agg = stream.toDS()
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("sum_value"))
    val q = agg.writeStream.format("memory").queryName("swout")
      .outputMode("append").start()
    try {
      // two arrival waves (sessions straddle them — the mid split
      // exercises cross-batch session merging), then a far-future
      // flush event that pushes the watermark past every session end
      val (a, b) = all.splitAt(all.length / 2)
      stream.addData(a.toSeq); q.processAllAvailable()
      stream.addData(b.toSeq); q.processAllAvailable()
      val maxTs = all.map(_.ts.getTime).max
      stream.addData(Seq(WalEvent(999999L, -1L,
        new java.sql.Timestamp(maxTs + 7200000L), 0.0)))
      q.processAllAvailable()

      val got = spark.table("swout")
        .where(col("user_id") >= 0) // drop the flush sentinel's session
        .select(col("user_id"),
          col("session_window.start").cast("long").as("ss"),
          col("session_window.end").cast("long").as("se"),
          col("n_events"), col("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet

      val want = Tables.events(spark, sf)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 4).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").cast("long").as("ss"),
          col("session_window.end").cast("long").as("se"),
          col("n_events"), col("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet

      assert(got == want,
        s"stream ${got.size} sessions vs batch ${want.size}; " +
          s"missing ${(want -- got).take(3)}; extra ${(got -- want).take(3)}")
      // exactly-once: no session emitted twice
      val keys = spark.table("swout").where(col("user_id") >= 0)
        .select("user_id", "session_window.start").collect()
      assert(keys.length == keys.distinct.length)
    } finally q.stop()
  }
}
