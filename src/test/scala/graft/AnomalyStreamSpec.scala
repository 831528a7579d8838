package graft

import graft.operators.Analytics
import graft.streaming.{AnomalyStream, DailyCount}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The online anomaly detector's streaming/batch equivalence: the
  * oracled batch query (`events_anomaly_online`, cumulative
  * ROWS … 1 PRECEDING windows) IS the replay of what the stateful
  * stream emits as days close — scores never revise, so the stream's
  * append output must equal the batch result however the days are
  * batched.
  */
class AnomalyStreamSpec extends SparkSuite {

  private def dailyRows(): Seq[DailyCount] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .as[DailyCount].collect().toSeq.sortBy(d => (d.event_type, d.day))
  }

  private def batchWant(): Set[(String, String, Long, Double)] =
    Analytics.eventsAnomalyOnline(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

  private def run(waves: Seq[Seq[DailyCount]],
                  name: String): Set[(String, String, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[DailyCount]
    val q = AnomalyStream.detect(spark, stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
    } finally q.stop()
  }

  test("single-batch stream replays the oracled batch query exactly") {
    val got = run(Seq(dailyRows()), "anomaly_one")
    assert(got == batchWant(), s"stream $got vs batch ${batchWant()}")
    assert(got.nonEmpty, "fixture produced no flags — spec is vacuous")
  }

  test("state carries across micro-batches: waves change nothing") {
    // three chronological waves (the input contract: days close in
    // event-time order); warmup spans the first wave, so flags from
    // later waves depend on state built in earlier ones
    val rows = dailyRows()
    val days = rows.map(_.day).distinct.sorted
    val cut1 = days(days.size / 3)
    val cut2 = days(2 * days.size / 3)
    val waves = Seq(
      rows.filter(_.day <= cut1),
      rows.filter(d => d.day > cut1 && d.day <= cut2),
      rows.filter(_.day > cut2))
    val got = run(waves, "anomaly_waves")
    assert(got == batchWant(), s"waved stream $got vs batch ${batchWant()}")
  }
}
