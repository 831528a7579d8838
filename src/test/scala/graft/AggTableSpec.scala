package graft

import graft.operators.AggTable
import org.apache.spark.sql.functions._

/** The maintained daily rollup (incremental view maintenance):
  * generations of distributive partials must fold to EXACTLY the
  * one-shot aggregate (integer micro-units — no float tolerance),
  * redelivery must replace rather than double-count, serving must
  * prune to the requested day partitions, and the streamed twin must
  * converge to the batch build.
  */
class AggTableSpec extends SparkSuite {

  private def full = Tables.events(spark, sf)
    .select("event_id", "user_id", "ts", "event_type", "value")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("day", "event_type", "n", "sv_micros").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("build + inserts ≡ one-shot rebuild, exactly; redelivery is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "aggtab")
    val path = dir.resolve("daily").toString
    try {
      val ev = full
      AggTable.build(spark, path, ev.where(col("event_id") % 4 =!= 3))
      val b1 = ev.where(col("event_id") % 4 === 3 && col("user_id") % 2 === 0)
      val b2 = ev.where(col("event_id") % 4 === 3 && col("user_id") % 2 =!= 0)
      AggTable.insert(spark, path, b1, gen = 1L)
      AggTable.insert(spark, path, b2, gen = 2L)
      val maintained = asSet(AggTable.serve(spark, path))
      val rebuilt = asSet(AggTable.dailyAgg(ev))
      assert(maintained == rebuilt && maintained.nonEmpty)
      // redelivery of batch 1 (crash replay): its generation is
      // REPLACED by the dynamic overwrite — state unchanged
      AggTable.insert(spark, path, b1, gen = 1L)
      assert(asSet(AggTable.serve(spark, path)) == rebuilt)
      // rebuild-as-compaction: fold everything into gen 0, vacuum
      // the folded generations, still ≡ rebuild
      AggTable.build(spark, path, ev)
      assert(AggTable.vacuumGens(spark, path, upToGen = 2L) == Seq(1L, 2L))
      assert(asSet(AggTable.serve(spark, path)) == rebuilt)
    } finally {
      new scala.reflect.io.Directory(dir.toFile).deleteRecursively()
    }
  }

  test("redelivery with a SHRUNK day set leaves no stale partitions") {
    // A retried batch can cover fewer days than the first attempt
    // (source mutated across restart). Generation replacement must be
    // exact — the first attempt's extra day partitions must NOT
    // survive and double-count at serve time.
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "aggtabd")
    val path = dir.resolve("daily").toString
    try {
      val ev = full
      val base = ev.where(col("event_id") % 4 =!= 3)
      AggTable.build(spark, path, base)
      val b1full = ev.where(col("event_id") % 4 === 3)
      AggTable.insert(spark, path, b1full, gen = 1L)
      // retry of gen 1 arrives with only half the users → fewer rows,
      // possibly fewer (day, type) partitions
      val b1shrunk = b1full.where(col("user_id") % 2 === 0)
      AggTable.insert(spark, path, b1shrunk, gen = 1L)
      val want = asSet(AggTable.dailyAgg(base.unionByName(b1shrunk)))
      assert(asSet(AggTable.serve(spark, path)) == want,
        "stale partitions from the first gen-1 attempt survived")
    } finally {
      new scala.reflect.io.Directory(dir.toFile).deleteRecursively()
    }
  }

  test("day-ranged serve prunes partitions and matches the filtered rebuild") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "aggtabp")
    val path = dir.resolve("daily").toString
    try {
      AggTable.build(spark, path, full)
      val days = AggTable.dailyAgg(full).select("day").distinct()
        .orderBy("day").collect().map(_.getLong(0))
      assume(days.length >= 3)
      val (lo, hi) = (days(1), days(days.length - 2))
      val served = AggTable.serve(spark, path, Some(lo), Some(hi))
      val want = asSet(AggTable.dailyAgg(
        full.where(datediff(col("ts").cast("date"),
          lit("1970-01-01").cast("date")).between(lo, hi))))
      assert(asSet(served) == want)
      // the day range reaches the scan as a partition filter
      val pf = served.queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(pf.contains("day") && !pf.contains("PartitionFilters: []"),
        s"day range not partition-pruned: $pf")
    } finally {
      new scala.reflect.io.Directory(dir.toFile).deleteRecursively()
    }
  }

  test("streamed generations converge to the batch rollup (15th streaming structure)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "aggtabs")
    val path = dir.resolve("daily").toString
    val ckpt = dir.resolve("ckpt").toString
    try {
      val ev = full
      AggTable.build(spark, path, ev.where(col("event_id") % 4 =!= 3))
      val tail = ev.where(col("event_id") % 4 === 3)
        .select("event_id", "ts", "event_type", "value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
          r.getDouble(3)))
      val ms = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
      val stream = ms.toDF()
        .toDF("event_id", "ts", "event_type", "value")
      val q = graft.streaming.AggMaintenance.attach(stream, path, ckpt)
      try {
        val (w1, w2) = tail.splitAt(tail.length / 2)
        ms.addData(w1.toSeq); q.processAllAvailable()
        ms.addData(w2.toSeq); q.processAllAvailable()
      } finally q.stop()
      assert(asSet(AggTable.serve(spark, path)) == asSet(AggTable.dailyAgg(ev)))
    } finally {
      new scala.reflect.io.Directory(dir.toFile).deleteRecursively()
    }
  }
}
