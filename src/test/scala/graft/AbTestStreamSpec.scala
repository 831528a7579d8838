package graft

import graft.operators.Analytics
import graft.streaming.{AbEvent, AbTestStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The live A/B dashboard's streaming/batch equivalence: the state is
  * the sufficient statistic (six exact BIGINTs per type), so the
  * final emission must equal the oracled batch query however events
  * are micro-batched.
  */
class AbTestStreamSpec extends SparkSuite {

  private def eventRows(): Seq[AbEvent] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("value"))
      .as[AbEvent].collect().toSeq
  }

  private def batchWant(): Set[(String, Long, Long, Double, Double, Double)] =
    Analytics.eventsAbTest(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet

  private def finalEmissions(name: String)
      : Set[(String, Long, Long, Double, Double, Double)] = {
    val all = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // the final emission per type is the one with the largest cohort
    // total (counts are monotone across batches)
    all.groupBy(_._1).map { case (_, rows) =>
      rows.maxBy(r => r._2 + r._3)
    }.toSet
  }

  private def run(waves: Seq[Seq[AbEvent]], name: String): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[AbEvent]
    val q = AbTestStream.report(spark, stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try waves.foreach { w => stream.addData(w); q.processAllAvailable() }
    finally q.stop()
  }

  test("single-batch stream's emission equals the oracled batch query") {
    run(Seq(eventRows()), "ab_one")
    assert(finalEmissions("ab_one") == batchWant())
    assert(batchWant().nonEmpty)
  }

  test("arbitrary micro-batching reaches identical final statistics") {
    val rows = eventRows()
    val waves = rows.grouped(math.max(1, rows.length / 7)).toSeq
    assert(waves.length > 3)
    run(waves, "ab_waves")
    assert(finalEmissions("ab_waves") == batchWant())
    // intermediate emissions exist (a live dashboard, not a single
    // end-of-stream answer): more emissions than event types
    assert(spark.table("ab_waves").count() >
      batchWant().size.toLong)
  }
}
