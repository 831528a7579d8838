package graft

import graft.operators.Sequence
import graft.streaming.{BotScoreStream, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming/batch equivalence for the bot scorer: gap moments are
  * mergeable integers and the cross-batch cursor links boundary
  * gaps, so the LATEST update-mode emission per user must equal the
  * oracled batch query under any event-time-ordered micro-batching.
  */
class BotScoreStreamSpec extends SparkSuite {

  private def eventRows(): Seq[UserEvent] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      .as[UserEvent].collect().toSeq
      .sortBy(e => (e.sec, e.event_id))
  }

  private def batchWant(): Set[(Long, Long, Double, Double, Boolean)] =
    Sequence.botScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSet

  /** Latest emission per user across all waves. */
  private def run(waves: Seq[Seq[UserEvent]],
                  name: String): Set[(Long, Long, Double, Double, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val q = BotScoreStream.attach(spark, stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
      // update mode appends each batch's emissions to the memory
      // sink; the user's final score is the one with max n_gaps
      // (moments only grow)
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getBoolean(4)))
        .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
    } finally q.stop()
  }

  test("single-batch stream replays the oracled batch query exactly") {
    val got = run(Seq(eventRows()), "bot_one")
    val want = batchWant()
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("moments merge across micro-batches: the boundary gap is " +
    "bridged by the stored cursor") {
    val rows = eventRows()
    val third = rows.size / 3
    val waves = Seq(rows.take(third), rows.slice(third, 2 * third),
      rows.drop(2 * third))
    assert(waves.forall(_.nonEmpty))
    assert(run(waves, "bot_waves") == batchWant())
  }
}
