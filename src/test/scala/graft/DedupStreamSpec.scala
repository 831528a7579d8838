package graft

import graft.streaming.DedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class DedupStreamSpec extends SparkSuite {

  test("stream suppresses every later copy; first arrival wins across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, String)]
    val out = DedupStream.firstSeen(
      stream.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    try {
      // batch 1: two distinct texts, one in-batch duplicate
      stream.addData((1L, "alpha beta"), (2L, "gamma"), (3L, "alpha beta"))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate (state must remember batch 1)
      // and one novel text
      stream.addData((4L, "gamma"), (5L, "delta"))
      q.processAllAvailable()

      val got = spark.table("dedupstream")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "alpha beta"), (2L, "gamma"), (5L, "delta")),
        s"wrong survivors: $got")
    } finally q.stop()
  }

  test("streamed survivors equal the batch twin's first ids on the sf corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = graft.operators.Dedup.corpusWithExactDups(spark, sf)
      .select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val stream = MemoryStream[(Long, String)]
    val out = DedupStream.firstSeen(stream.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("dedupsf")
      .outputMode("append").start()
    try {
      // feed in doc_id order over two batches, so "first seen" ≡
      // min(doc_id) — the batch twin's canonicalization
      val (a, b) = rows.splitAt(rows.length / 2)
      stream.addData(a.toSeq); q.processAllAvailable()
      stream.addData(b.toSeq); q.processAllAvailable()
      val got = spark.table("dedupsf")
        .select("fp", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val want = DedupStream.dedupStateQuery(spark, sf)
        .select("fp", "first_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }
}
