package graft

import graft.operators.Analytics
import graft.streaming.{DailyCount, PageHinkleyStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The Page–Hinkley detector's streaming/batch equivalence: PH is a
  * one-pass recurrence over four BIGINTs of state, so the stream's
  * per-day points must be bit-equal to the batch window replay (the
  * series behind the oracled `events_page_hinkley` summary) however
  * the dense days are micro-batched.
  */
class PageHinkleyStreamSpec extends SparkSuite {

  private def denseRows(): Seq[DailyCount] = {
    import spark.implicits._
    val ev = Tables.events(spark, sf).select(col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val daily = ev.groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    val meta = ev.agg(min("d").as("lo"), max("d").as("hi"),
      collect_set("event_type").as("tys")).localCheckpoint(true)
    val cal = meta.select(explode(sequence(col("lo"), col("hi"))).as("d"))
    meta.select(explode(col("tys")).as("event_type")).crossJoin(cal)
      .join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"),
        date_add(lit("1970-01-01").cast("date"), col("d").cast("int"))
          .cast("string").as("day"),
        coalesce(col("n"), lit(0L)).as("n"))
      .as[DailyCount].collect().toSeq.sortBy(d => (d.event_type, d.day))
  }

  /** Batch per-day PH series keyed identically to the stream points. */
  private def batchSeries(): Set[(String, String, Long)] =
    Analytics.pageHinkleySeries(spark, sf)
      .select(col("event_type"),
        date_add(lit("1970-01-01").cast("date"), col("d").cast("int"))
          .cast("string").as("day"),
        col("ph"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

  private def run(waves: Seq[Seq[DailyCount]],
                  name: String): Set[(String, String, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[DailyCount]
    val q = PageHinkleyStream.detect(spark, stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    } finally q.stop()
  }

  test("single-batch stream equals the batch window replay bit-for-bit") {
    val got = run(Seq(denseRows()), "ph_one")
    val want = batchSeries()
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("day-sliced waves change nothing (state carries across batches)") {
    val rows = denseRows()
    val days = rows.map(_.day).distinct.sorted
    val cut = days(days.length / 2)
    val waves = Seq(rows.filter(_.day <= cut), rows.filter(_.day > cut))
    assert(run(waves, "ph_waves") == batchSeries())
  }

  test("alarm flag matches the summary's integer threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[DailyCount]
    val q = PageHinkleyStream.detect(spark, stream.toDS())
      .writeStream.format("memory").queryName("ph_alarm")
      .outputMode("append").start()
    try {
      stream.addData(denseRows()); q.processAllAvailable()
      val pts = spark.table("ph_alarm").collect()
      pts.foreach { r =>
        assert(r.getBoolean(3) ==
          (r.getLong(2) > PageHinkleyStream.LambdaMicro))
      }
      // summary n_alarms equals the count of flagged stream points
      val streamed = pts.count(_.getBoolean(3)).toLong
      val batch = Analytics.eventsPageHinkley(spark, sf)
        .agg(sum("n_alarms")).head().getLong(0)
      assert(streamed == batch)
    } finally q.stop()
  }
}
