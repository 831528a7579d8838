package graft

import graft.streaming.WalEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregation in APPEND mode: a window is
  * emitted exactly once, when the watermark passes its end — the
  * streaming contract that lets 100 TB/day event streams aggregate
  * with bounded state (late data beyond the watermark is dropped,
  * state for closed windows is freed).
  */
class WatermarkSpec extends SparkSuite {

  test("append-mode daily windows finalize as the watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "value")
      .as[WalEvent].collect().sortBy(_.ts.getTime)

    val stream = MemoryStream[WalEvent]
    val agg = stream.toDS()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
    val q = agg.writeStream.format("memory").queryName("wmout")
      .outputMode("append").start()
    try {
      // feed everything except the final day, then the rest — the
      // second batch's max ts advances the watermark past every
      // earlier day's window end
      val lastDay = all.map(_.ts.getTime).max / 86400000L
      val (early, late) = all.partition(_.ts.getTime / 86400000L < lastDay)
      stream.addData(early.toSeq); q.processAllAvailable()
      stream.addData(late.toSeq); q.processAllAvailable()

      val got = spark.table("wmout")
        .select(col("window.start").as("day"), col("n"), col("sv"))
        .collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2))).toSet

      val want = Tables.events(spark, sf)
        .groupBy(window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
        .select(col("window.start").as("day"), col("n"), col("sv"))
        .collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2))).toSet

      // every appended window is final and matches batch exactly;
      // only the still-open last day may be absent
      assert(got.subsetOf(want))
      assert(got.size >= want.size - 1, s"${got.size} vs ${want.size}")
      // no window was emitted twice
      val days = spark.table("wmout").select("window.start").collect()
      assert(days.length == days.distinct.length)
    } finally q.stop()
  }
}
