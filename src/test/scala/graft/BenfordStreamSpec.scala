package graft

import graft.streaming.BenfordStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming Benford audit's contract: digit counts fold
  * additively across micro-batches (bounded 9-row state), the final
  * state equals the oracled batch audit exactly however arrival is
  * scrambled, and sub-cent / non-positive values are excluded on
  * both paths.
  */
class BenfordStreamSpec extends SparkSuite {

  test("streamed digit counts equal the batch audit; state stays 9 rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sf).select("event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val stream = MemoryStream[(Long, Double)]
    val out = BenfordStream.counts(
      stream.toDF().toDF("event_id", "value"))
    val q = out.writeStream.format("memory").queryName("benfordcounts")
      .outputMode("complete").start()
    try {
      // arrival-order-scrambled waves: counts are order-free
      val waves = rows.sortBy(e => (e._1 * 2654435761L) % 1000)
        .grouped(math.max(rows.length / 3, 1)).toSeq
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
      val got = spark.table("benfordcounts").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = graft.operators.Analytics.eventsBenford(spark, sf)
        .select("digit", "n_obs").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"stream $got vs batch $want")
      assert(got.keySet.subsetOf((1L to 9L).toSet),
        "digit key space escaped 1..9")
    } finally q.stop()
  }

  test("zero and negative values never enter the digit state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Double)]
    val out = BenfordStream.counts(
      stream.toDF().toDF("event_id", "value"))
    val q = out.writeStream.format("memory").queryName("benfordedge")
      .outputMode("complete").start()
    try {
      stream.addData(Seq((1L, 0.0), (2L, -5.0), (3L, 0.004), (4L, 9.5)))
      q.processAllAvailable()
      val got = spark.table("benfordedge").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // only 9.5 -> 950 cents -> digit 9 survives (0.004 rounds to 0)
      assert(got == Map(9L -> 1L), s"edge filtering broke: $got")
    } finally q.stop()
  }
}
