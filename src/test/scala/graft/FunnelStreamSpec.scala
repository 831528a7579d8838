package graft

import graft.operators.Analytics
import graft.streaming.{FunnelEvent, FunnelStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The funnel's streaming/batch equivalence: a user advances each
  * stage at most once, so the stream's per-stage emission counts
  * must equal the oracled batch stage counts however the events are
  * day-sliced into micro-batches.
  */
class FunnelStreamSpec extends SparkSuite {

  private def eventRows(): Seq[FunnelEvent] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_micros"))
      .as[FunnelEvent].collect().toSeq
      .sortBy(e => (e.user_id, e.ts_micros))
  }

  private def batchWant(): Map[Long, Long] =
    Analytics.eventsFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap

  private def run(waves: Seq[Seq[FunnelEvent]],
                  name: String): Map[Long, Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[FunnelEvent]
    val q = FunnelStream.advance(spark, stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
      spark.table(name).groupBy("stage").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally q.stop()
  }

  test("single-batch stream's stage counts equal the oracled funnel") {
    val got = run(Seq(eventRows()), "fun_one")
    val want = batchWant()
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("day-sliced waves change nothing (three-timestamp state)") {
    val rows = eventRows()
    val days = rows.map(_.ts_micros / 86400000000L).distinct.sorted
    val cut = days(days.length / 2)
    val waves = Seq(rows.filter(_.ts_micros / 86400000000L <= cut),
      rows.filter(_.ts_micros / 86400000000L > cut))
    assert(run(waves, "fun_waves") == batchWant())
  }

  test("same-ts view+click tie advances both stages (RANGE tie rule)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[FunnelEvent]
    val q = FunnelStream.advance(spark, stream.toDS())
      .writeStream.format("memory").queryName("fun_tie")
      .outputMode("append").start()
    try {
      // click arrives BEFORE the view in the batch but at the same
      // timestamp — the batch RANGE frame qualifies it, so must we
      stream.addData(Seq(
        FunnelEvent(999999L, "click", 1000L),
        FunnelEvent(999999L, "view", 1000L)))
      q.processAllAvailable()
      val got = spark.table("fun_tie")
        .where(col("user_id") === 999999L)
        .select("stage").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L))
    } finally q.stop()
  }
}
