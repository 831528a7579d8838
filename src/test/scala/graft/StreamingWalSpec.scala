package graft

import graft.streaming.{WalEvent, WalStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingWalSpec extends SparkSuite {

  test("streaming WAL recovery converges to the batch replay state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "value")
    val rows = batch.as[WalEvent].collect().sortBy(_.event_id)

    // feed the log in two chunks: "snapshot" half then "tail" half —
    // mirrors the reference's snapshot + WAL-tail recovery split
    val stream = MemoryStream[WalEvent]
    val out = WalStream.recover(spark, stream.toDS())
    val q = out.writeStream.format("memory").queryName("walstate")
      .outputMode("update").start()
    try {
      val (snap, tail) = rows.splitAt(rows.length / 2)
      stream.addData(snap.toSeq); q.processAllAvailable()
      stream.addData(tail.toSeq); q.processAllAvailable()

      // latest state per key from the update-mode sink
      val got = spark.table("walstate")
        .groupBy("user_id")
        .agg(max_by(struct(col("n_events"), col("sum_value"),
          col("last_value")), col("n_events")).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.sum_value"),
          col("s.last_value"))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1),
          math.rint(r.getDouble(2) * 1e4) / 1e4,
          math.rint(r.getDouble(3) * 1e4) / 1e4)))
        .toMap

      val want = WalStream.batchReference(batch).collect()
        .map(r => (r.getLong(0), (r.getLong(1),
          math.rint(r.getDouble(2) * 1e4) / 1e4,
          math.rint(r.getDouble(3) * 1e4) / 1e4)))
        .toMap

      assert(got == want)
    } finally q.stop()
  }

  test("tumbling-window aggregation runs identically as a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batchEvents = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "value")
    val rows = batchEvents.as[WalEvent].collect()

    val stream = MemoryStream[WalEvent]
    val agg = stream.toDF()
      .withColumn("event_type", col("user_id") % 3) // cheap stand-in key
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    val q = agg.writeStream.format("memory").queryName("tumble")
      .outputMode("complete").start()
    try {
      stream.addData(rows.toSeq); q.processAllAvailable()
      val got = spark.table("tumble")
        .select(col("window.start").as("day"), col("event_type"),
          col("n"), round(col("sum_value"), 4).as("sv"))
        .collect().map(r => (r.get(0).toString, r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val want = batchEvents
        .withColumn("event_type", col("user_id") % 3)
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
        .select(col("window.start").as("day"), col("event_type"),
          col("n"), col("sv"))
        .collect().map(r => (r.get(0).toString, r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got == want)
    } finally q.stop()
  }
}
