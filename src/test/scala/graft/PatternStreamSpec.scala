package graft

import graft.operators.Sequence
import graft.streaming.{PatternEvent, PatternStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The sequence detector's streaming/batch equivalence: the batch
  * op's two running RANGE maxima are the stream's constant-size
  * per-user state, so the aggregated append feed must equal the
  * oracled `events_pattern_match` output however the (event-time
  * ordered) stream is micro-batched.
  */
class PatternStreamSpec extends SparkSuite {

  private def eventRows(): Seq[PatternEvent] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[PatternEvent].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.user_id))
  }

  private def batchWant(): Map[Long, (Long, Long, Long)] =
    Sequence.patternMatch(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        r.getTimestamp(2).getTime, r.getTimestamp(3).getTime)).toMap

  private def run(waves: Seq[Seq[PatternEvent]],
                  name: String): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[PatternEvent]
    val q = PatternStream.matches(spark, stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
        .groupBy(_._1)
        .map { case (u, hits) =>
          val ts = hits.map(_._2)
          u -> (hits.length.toLong, ts.min, ts.max)
        }
    } finally q.stop()
  }

  test("single-batch stream replays the oracled batch query exactly") {
    val got = run(Seq(eventRows()), "pat_one")
    val want = batchWant()
    assert(got == want)
    assert(got.nonEmpty, "no matches at this SF — test is vacuous")
  }

  test("day-sliced micro-batches reach the same totals") {
    val rows = eventRows()
    // slice at day boundaries: same-ts rows of a user stay together
    val waves = rows.groupBy(_.ts.toInstant.getEpochSecond / 86400L)
      .toSeq.sortBy(_._1).map(_._2)
    assert(waves.length > 2)
    val got = run(waves, "pat_days")
    assert(got == batchWant())
  }

  test("state machine honors the gap on the click stage mid-stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[PatternEvent]
    val q = PatternStream.matches(spark, stream.toDS(), gapSeconds = 3600L)
      .writeStream.format("memory").queryName("pat_gap")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        PatternEvent(7L, "view", ts("2024-01-01 10:00:00")),
        PatternEvent(7L, "click", ts("2024-01-01 13:00:00")))) // stale view
      q.processAllAvailable()
      assert(spark.table("pat_gap").count() === 0)
      stream.addData(Seq(
        PatternEvent(7L, "view", ts("2024-01-01 13:30:00")),
        PatternEvent(7L, "click", ts("2024-01-01 13:45:00")),
        PatternEvent(7L, "purchase", ts("2024-01-01 14:00:00"))))
      q.processAllAvailable()
      assert(spark.table("pat_gap").count() === 1)
    } finally q.stop()
  }
}
