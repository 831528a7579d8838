package graft

import graft.operators.Analytics
import graft.streaming.{MicroValue, MomentsStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The running-moments dashboard's streaming/batch equivalence:
  * power sums are order-free exact integers, so after the stream
  * drains the LATEST emission per key must equal the oracled
  * `events_moments` batch row bit-for-bit, however the values are
  * micro-batched.
  */
class MomentsStreamSpec extends SparkSuite {

  private def valueRows(): Seq[MicroValue] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("micro"))
      .as[MicroValue].collect().toSeq
  }

  private def batchWant(): Map[String, (Long, Double, Double, Double)] =
    Analytics.eventsMoments(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  /** Latest emission per key (n is monotone — max n wins). */
  private def run(waves: Seq[Seq[MicroValue]], name: String)
      : Map[String, (Long, Double, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[MicroValue]
    // update mode — the operator declares Update (each batch REVISES
    // the key's row); the memory sink records every revision and the
    // max-n fold below picks the latest, mirroring an upserting sink
    val q = MomentsStream.track(spark, stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
        .groupBy(_._1)
        .map { case (k, rows) =>
          val last = rows.maxBy(_._2)
          k -> (last._2, last._3, last._4, last._5)
        }
    } finally q.stop()
  }

  test("drained stream's latest rows equal the oracled batch query") {
    val got = run(Seq(valueRows()), "mom_one")
    val want = batchWant()
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("arbitrary wave splits change nothing (order-free power sums)") {
    val rows = valueRows()
    val (a, b) = rows.splitAt(rows.length / 3)
    assert(run(Seq(a, b), "mom_waves") == batchWant())
  }
}
