package graft

import graft.operators.Sketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The KMV sketch STREAMING: mergeability is exactly what makes a
  * sketch streamable — each micro-batch folds into the bounded
  * aggregation buffer in the state store (≤ k longs per group, same
  * KmvAgg the batch query uses), so the stream's state is
  * sketch-sized forever while count(distinct) state would grow with
  * every distinct value seen. The batch twin `sketch_kmv_distinct`
  * sits under the DuckDB oracle; this spec proves the stream
  * converges to exactly that result, in waves and regardless of
  * arrival order.
  */
case class KmvEv(event_type: String, user_id: Long)

class SketchStreamSpec extends SparkSuite {

  test("streaming KMV converges to the batch sketch across waves") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = Tables.events(spark, sf).select("event_type", "user_id")
    val rows = batch.as[KmvEv].collect()

    val stream = MemoryStream[KmvEv]
    // the SAME operator body as the oracled batch query — complete
    // mode republishes the full per-group state each trigger
    val out = Sketch.kmvDistinct(stream.toDF(), "event_type", "user_id")
    val q = out.writeStream.format("memory").queryName("kmvstate")
      .outputMode("complete").start()
    try {
      // three chronology-scrambled waves: KMV state is a set of
      // min-hashes, so arrival order must not matter
      val waves = rows.sortBy(e => (e.user_id * 2654435761L) % 1000)
        .grouped(math.max(rows.length / 3, 1)).toSeq
      waves.foreach { w => stream.addData(w.toSeq); q.processAllAvailable() }

      val got = spark.table("kmvstate")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      val want = Sketch.kmvQuery(spark, sf)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(got == want, s"stream $got vs batch $want")
      // bounded state: no group retains more than k hashes
      assert(got.values.forall(_._1 <= Sketch.K))
    } finally q.stop()
  }

  test("streaming HLL registers finalize to the batch estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Tables.events(spark, sf).select("event_type", "user_id")
      .as[KmvEv].collect()

    val stream = MemoryStream[KmvEv]
    // the register table IS the streamable half of the HLL — one max
    // aggregation whose state is bounded at groups×m rows forever
    // (the r=max(ρ) merge is idempotent and order-free), same
    // state/finalize split as the histogram and CMS twins
    val out = Sketch.hllRegisters(stream.toDF(), "event_type", "user_id")
    val q = out.writeStream.format("memory").queryName("hllstate")
      .outputMode("complete").start()
    try {
      // arrival-order-scrambled waves, with the first wave REPLAYED
      // in the last (redelivery): max-merge must absorb both
      val waves = rows.sortBy(e => (e.user_id * 2654435761L) % 1000)
        .grouped(math.max(rows.length / 3, 1)).toSeq
      waves.foreach { w => stream.addData(w.toSeq); q.processAllAvailable() }
      stream.addData(waves.head.toSeq); q.processAllAvailable()

      val got = Sketch.hllFinish(spark.table("hllstate"), "event_type")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      val want = Sketch.hllQuery(spark, sf)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(got == want, s"stream $got vs batch $want")
      // bounded state: at most m registers per group
      assert(spark.table("hllstate").count() <=
        want.size.toLong * Sketch.HllM)
    } finally q.stop()
  }

  test("streaming histogram state finalizes to the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batchDocs = Tables.documents(spark, sf).select("lang", "n_chars")
    val rows = batchDocs.as[(String, Long)].collect()

    val stream = MemoryStream[(String, Long)]
    // the STATE is the streamable half (plain binned-count
    // aggregation); the window-function finish runs over the final
    // summary-sized state — the same state/finalize split KmvAgg has
    val out = Sketch.histBinCounts(
      stream.toDF().toDF("lang", "n_chars"), "lang", "n_chars")
    val q = out.writeStream.format("memory").queryName("histstate")
      .outputMode("complete").start()
    try {
      val waves = rows.sortBy(r => (r._2 * 2654435761L) % 1000)
        .grouped(math.max(rows.length / 3, 1)).toSeq
      waves.foreach { w => stream.addData(w.toSeq); q.processAllAvailable() }

      val got = Sketch.histFinish(spark.table("histstate"), "lang", 64)
        .collect().toSeq
      val want = Sketch.histQuantile(batchDocs, "lang", "n_chars")
        .collect().toSeq
      assert(got == want, s"stream-finalized $got vs batch $want")
    } finally q.stop()
  }

  test("streaming count-min state finalizes to the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batchToks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
    val rows = batchToks.as[String].collect()

    val stream = MemoryStream[String]
    // CMS bucket counts are additive, so the state is a plain
    // streaming aggregation — waves fold exactly like partitions;
    // the candidate probe runs over the finalized summary
    val out = Sketch.cmsState(stream.toDF().toDF("tok"), "tok")
    val q = out.writeStream.format("memory").queryName("cmsstate")
      .outputMode("complete").start()
    try {
      val waves = rows.sortBy(t => (t.hashCode * 2654435761L) % 1000)
        .grouped(math.max(rows.length / 3, 1)).toSeq
      waves.foreach { w => stream.addData(w.toSeq); q.processAllAvailable() }

      val got = Sketch.cmsProbeTopK(spark.table("cmsstate"),
        batchToks.distinct(), "tok", 15).collect().toSeq
      val want = Sketch.cmsTopTermsQuery(spark, sf).collect().toSeq
      assert(got == want, s"stream-finalized $got vs batch $want")
      // bounded state however large the corpus: ≤ depth × width rows
      assert(spark.table("cmsstate").count() <= 4L * 1024L)
    } finally q.stop()
  }

  test("streaming grouped count-min finalizes to the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batchToks = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    val rows = batchToks.as[(String, String)].collect()

    val stream = MemoryStream[(String, String)]
    val out = Sketch.cmsStateBy(stream.toDF().toDF("lang", "tok"),
      "lang", "tok")
    val q = out.writeStream.format("memory").queryName("cmsgstate")
      .outputMode("complete").start()
    try {
      val waves = rows.sortBy(t => (t._2.hashCode * 2654435761L) % 1000)
        .grouped(math.max(rows.length / 3, 1)).toSeq
      waves.foreach { w => stream.addData(w.toSeq); q.processAllAvailable() }
      val got = Sketch.cmsProbeTopKBy(spark.table("cmsgstate"),
        batchToks.distinct(), "lang", "tok", 5).collect().toSeq
      val want = Sketch.cmsByLangQuery(spark, sf).collect().toSeq
      assert(got == want, s"stream-finalized $got vs batch $want")
      // ≤ groups × depth × width rows of state
      assert(spark.table("cmsgstate").count() <= 5L * 4L * 1024L)
    } finally q.stop()
  }

  test("streaming top-k heap converges to the batch heap across waves") {
    import graft.operators.TopKAgg
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the partial-aggregating heap is mergeable state exactly like
    // the sketches: ≤ k (key, id) pairs per group per partition —
    // proving it streams extends stream ≡ batch to the search kernel
    val batch = Tables.events(spark, sf)
      .select(col("event_type"), (-col("value")).as("key"),
        col("event_id").as("id"))
    val rows = batch.as[(String, Double, Long)].collect()

    val agg = TopKAgg.topK(3)
    def finish(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type")
        .agg(agg(col("key"), col("id")).as("top"))
        .select(col("event_type"), posexplode(col("top.items")))
        .select(col("event_type"), col("pos"), col("col.id"),
          col("col.key"))
        .orderBy("event_type", "pos")

    val stream = MemoryStream[(String, Double, Long)]
    val out = finish(stream.toDF().toDF("event_type", "key", "id"))
    val q = out.writeStream.format("memory").queryName("topkstate")
      .outputMode("complete").start()
    try {
      val waves = rows.sortBy(r => (r._3 * 2654435761L) % 1000)
        .grouped(math.max(rows.length / 3, 1)).toSeq
      waves.foreach { w => stream.addData(w.toSeq); q.processAllAvailable() }
      val got = spark.table("topkstate")
        .orderBy("event_type", "pos").collect().toSeq
      val want = finish(batch).collect().toSeq
      assert(got == want, s"stream heap $got vs batch $want")
    } finally q.stop()
  }

  test("streaming DSIR model: bucket counts fold additively, " +
    "finalized scores equal the batch model") {
    import graft.operators.Sampling
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batchDocs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text")
    val rows = batchDocs.as[(Long, String, String)].collect()

    // the model state is per-bucket (cp, cq) counts — additive, so
    // an arriving corpus folds into ≤ B rows of state-store buffer
    // (an importance-resampling model maintained LIVE as a stream)
    val stream = MemoryStream[(Long, String, String)]
    val out = Sampling.dsirBucketCounts(Sampling.dsirTokenBuckets(
      stream.toDF().toDF("doc_id", "lang", "text")))
    val q = out.writeStream.format("memory").queryName("dsirstate")
      .outputMode("complete").start()
    try {
      val waves = rows.sortBy(r => (r._1 * 2654435761L) % 1000)
        .grouped(math.max(rows.length / 3, 1)).toSeq
      waves.foreach { w => stream.addData(w.toSeq); q.processAllAvailable() }

      val got = Sampling.dsirScores(spark, spark.table("dsirstate"))
        .orderBy("b").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = Sampling.dsirScores(spark,
        Sampling.dsirBucketCounts(Sampling.dsirTokenBuckets(batchDocs)))
        .orderBy("b").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.nonEmpty)
      assert(got.toSeq == want.toSeq,
        "stream-finalized DSIR scores drifted from the batch model")
      // bounded state: at most B bucket rows
      assert(spark.table("dsirstate").count() <= 64L)
    } finally q.stop()
  }

  test("streaming rolling-p95 state folds additively and finalizes " +
    "to the batch dashboard") {
    import graft.operators.Analytics
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batchEv = Analytics.rollingEventFrame(spark, sf)
    val rows = batchEv.as[(String, Long, Long)].collect()

    // the windowed histogram is ONE additive aggregation (the offset
    // explode is stateless), so the whole trailing-window dashboard
    // maintains live in ≤ types×days×bins rows of state
    val stream = MemoryStream[(String, Long, Long)]
    val out = Analytics.rollingBinState(
      stream.toDF().toDF("event_type", "d", "cents"))
    val q = out.writeStream.format("memory").queryName("rollstate")
      .outputMode("complete").start()
    try {
      val waves = rows.sortBy(r => (r._2 * 2654435761L + r._3) % 1000)
        .grouped(math.max(rows.length / 3, 1)).toSeq
      waves.foreach { w => stream.addData(w.toSeq); q.processAllAvailable() }

      val got = Analytics.rollingP95Finish(spark.table("rollstate"))
        .collect().toSeq
      val want = Analytics.eventsRollingP95(spark, sf).collect().toSeq
      assert(got.nonEmpty)
      assert(got == want,
        "stream-finalized rolling p95 drifted from the batch query")
    } finally q.stop()
  }

  test("streaming HLL registers finalize to the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Tables.events(spark, sf).select("event_type", "user_id")
      .as[KmvEv].collect()

    val stream = MemoryStream[KmvEv]
    // register-wise max is the streamable half: one plain max
    // aggregation, state bounded at groups×64 rows forever — the
    // HLL mergeability property as a state store invariant
    val out = Sketch.hllRegisters(stream.toDF(), "event_type", "user_id")
    val q = out.writeStream.format("memory").queryName("hllstate")
      .outputMode("complete").start()
    try {
      val waves = rows.sortBy(e => (e.user_id * 2654435761L) % 1000)
        .grouped(math.max(rows.length / 3, 1)).toSeq
      waves.foreach { w => stream.addData(w.toSeq); q.processAllAvailable() }

      val got = Sketch.hllFinish(spark.table("hllstate"), "event_type")
        .collect().toSeq
      val want = Sketch.hllQuery(spark, sf).collect().toSeq
      assert(got == want, s"stream-finalized $got vs batch $want")
      // bounded state however large the corpus: ≤ groups × m rows
      val groups = rows.map(_.event_type).distinct.length
      assert(spark.table("hllstate").count() <= groups.toLong * Sketch.HllM)
    } finally q.stop()
  }
}
