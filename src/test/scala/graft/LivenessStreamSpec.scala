package graft

import graft.streaming.{LiveEvent, LivenessStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The timeout-driven liveness monitor: a type silent beyond its own
  * worst historical gap fires exactly one event-time alert; a type
  * that keeps flowing never does. Determinism comes from event-time
  * watermarks — no wall clock anywhere.
  */
class LivenessStreamSpec extends SparkSuite {

  private def ev(t: String, day: Long): LiveEvent =
    LiveEvent(t, new java.sql.Timestamp(day * 86400000L))

  test("silence beyond the metric's own worst gap fires one alert") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[LiveEvent]
    val q = LivenessStream.monitor(spark, stream.toDS())
      .writeStream.format("memory").queryName("liveness")
      .outputMode("update").start()
    try {
      // wave 1: A beats daily for days 0..9 (worst gap 1), B daily
      // 0..20 — watermark advances to day 20
      stream.addData((0L to 9L).map(ev("A", _)) ++
        (0L to 20L).map(ev("B", _)))
      q.processAllAvailable()
      // wave 2: only B keeps flowing (days 21..40); A is silent far
      // beyond its armed day-11 timer, which the day-20 watermark
      // already passed — the timeout fires in this batch
      stream.addData((21L to 40L).map(ev("B", _)))
      q.processAllAvailable()
      // wave 3: one more B beat so the engine evaluates timers against
      // the day-40 watermark (covers engines that fire on the NEXT
      // batch after the watermark passes the timer)
      stream.addData(Seq(ev("B", 41L)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("liveness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val fired = rows.filter(_._4)
    assert(fired.length == 1, s"expected one alert, got ${fired.toSeq}")
    assert(fired.head._1 == "A" && fired.head._2 == 9L)
    // B never fires, and its heartbeats reached day 41
    assert(!rows.exists(r => r._1 == "B" && r._4))
    assert(rows.filter(r => r._1 == "B" && !r._4).map(_._2).max == 41L)
  }

  test("a reviving metric restarts its history after the alert") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[LiveEvent]
    val q = LivenessStream.monitor(spark, stream.toDS())
      .writeStream.format("memory").queryName("liveness_revive")
      .outputMode("update").start()
    try {
      stream.addData((0L to 5L).map(ev("A", _)) :+ ev("B", 0L))
      q.processAllAvailable()
      stream.addData((6L to 30L).map(ev("B", _))) // A times out
      q.processAllAvailable()
      stream.addData(Seq(ev("B", 31L)))           // timer evaluation
      q.processAllAvailable()
      stream.addData(Seq(ev("A", 32L), ev("B", 32L))) // A revives
      q.processAllAvailable()
    } finally q.stop()
    val a = spark.table("liveness_revive").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
      .filter(_._1 == "A")
    assert(a.count(_._4) == 1)
    // the revival heartbeat starts fresh: max_gap resets to 0
    val revived = a.filter(r => !r._4 && r._2 == 32L)
    assert(revived.nonEmpty && revived.forall(_._3 == 0L))
  }
}
