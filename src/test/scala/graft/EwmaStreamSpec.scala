package graft

import graft.operators.Analytics
import graft.streaming.{DailyCount, EwmaStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The EWMA smoother's streaming/batch equivalence: the truncated
  * window makes per-key state bounded (13 counts), so the stream's
  * append output must equal the oracled batch query (`events_ewma`)
  * however the dense days are micro-batched.
  */
class EwmaStreamSpec extends SparkSuite {

  /** The DENSE per-type daily series — the batch op's grid, emitted
    * in event-time order (the stream's input contract).
    */
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

  private def batchWant(): Set[(String, String, Double)] =
    Analytics.eventsEwma(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet

  private def run(waves: Seq[Seq[DailyCount]],
                  name: String): Set[(String, String, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[DailyCount]
    val q = EwmaStream.smooth(spark, stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    } finally q.stop()
  }

  test("single-batch stream replays the oracled batch query exactly") {
    val got = run(Seq(denseRows()), "ewma_one")
    val want = batchWant()
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("state carries across micro-batches: waves change nothing") {
    val rows = denseRows()
    val days = rows.map(_.day).distinct.sorted
    val cut = days(days.size / 2)
    val waves = Seq(rows.filter(_.day < cut), rows.filter(_.day >= cut))
    assert(waves.forall(_.nonEmpty))
    assert(run(waves, "ewma_waves") == batchWant())
  }
}
