package graft

import graft.streaming.WalEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL JOIN with watermarks — the canonical
  * Structured Streaming join: each purchase pairs with the same
  * user's clicks in the preceding 6 hours, both sides unbounded. The
  * watermarks + the time-range condition are what let Spark BOUND the
  * join state (clicks older than purchase-watermark − 6 h are
  * provably unmatchable and evicted); without them a stream-stream
  * join would buffer both streams forever. The batch twin
  * (BatchTwins.intervalJoinQuery) is under the DuckDB oracle; this
  * spec proves the streaming join converges to it.
  */
class IntervalJoinSpec extends SparkSuite {

  test("watermarked purchase←click join equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ev = Tables.events(spark, sf)
    def side(t: String) = ev.where(col("event_type") === t)
      .select("event_id", "user_id", "ts", "value")
      .as[WalEvent].collect().sortBy(_.ts.getTime)
    val purchases = side("purchase")
    val clicks = side("click")

    val pStream = MemoryStream[WalEvent]
    val cStream = MemoryStream[WalEvent]
    val p = pStream.toDS().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    val c = cStream.toDS().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("interval 6 hours") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("p_id"), col("c_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
          .as("micros_before"))
    val q = joined.writeStream.format("memory").queryName("ijout")
      .outputMode("append").start()
    try {
      // two chronological waves split at a common time midpoint:
      // wave-2 purchases look back up to 6 h into wave-1 clicks, so
      // the join must retain click state across the batch boundary
      // (its eviction bound is purchase-watermark − 6 h — exactly
      // the retained window). Chronological order keeps every row
      // ahead of its stream's watermark: nothing is dropped as late.
      val allTs = (purchases ++ clicks).map(_.ts.getTime).sorted
      val midTs = allTs(allTs.length / 2)
      val (p1, p2) = purchases.partition(_.ts.getTime < midTs)
      val (c1, c2) = clicks.partition(_.ts.getTime < midTs)
      pStream.addData(p1.toSeq); cStream.addData(c1.toSeq)
      q.processAllAvailable()
      pStream.addData(p2.toSeq); cStream.addData(c2.toSeq)
      q.processAllAvailable()

      val got = spark.table("ijout").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = graft.streaming.BatchTwins
        .intervalJoinQuery(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want,
        s"stream ${got.size} pairs vs batch ${want.size}; " +
          s"missing ${(want -- got).take(3)}; extra ${(got -- want).take(3)}")
      // no pair emitted twice (inner interval join is exactly-once)
      val n = spark.table("ijout").count()
      assert(n == got.size, s"duplicates: $n rows for ${got.size} pairs")
    } finally q.stop()
  }
}
