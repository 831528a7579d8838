package graft

import graft.operators.Analytics
import graft.streaming.{DailyCount, HoltStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The truncated-Holt forecaster's streaming/batch equivalence: the
  * 14-day truncation bounds per-key state (13 counts) and the fold
  * is pure truncating integer arithmetic, so the stream's points
  * must equal the oracled batch query exactly however the dense days
  * are micro-batched.
  */
class HoltStreamSpec extends SparkSuite {

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

  private def batchWant(): Set[(String, String, Double, Double, Double)] =
    Analytics.eventsForecastHolt(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

  private def run(waves: Seq[Seq[DailyCount]], name: String)
      : Set[(String, String, Double, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[DailyCount]
    val q = HoltStream.forecast(spark, stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSet
    } finally q.stop()
  }

  test("single-batch stream equals the oracled batch query exactly") {
    val got = run(Seq(denseRows()), "holt_one")
    val want = batchWant()
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("day-sliced waves change nothing (window state carries over)") {
    val rows = denseRows()
    val days = rows.map(_.day).distinct.sorted
    val cut = days(days.length / 2)
    val waves = Seq(rows.filter(_.day <= cut), rows.filter(_.day > cut))
    assert(run(waves, "holt_waves") == batchWant())
  }

  test("fold handles a falling series with a negative trend") {
    val (l, b) = HoltStream.fold(Seq(100L, 80L, 60L, 40L))
    assert(b < 0L, s"trend should be negative, got $b")
    // truncation toward zero on negatives — the div/`//`/Long./
    // convention all three engines share
    assert((-3L) / 2L == -1L)
  }
}
