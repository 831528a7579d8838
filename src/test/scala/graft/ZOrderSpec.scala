package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSuite {

  test("interleave places a-bits even, b-bits odd") {
    val r = spark.range(1)
      .select(ZOrder.interleave(lit(3L), lit(0L), 4).as("a"),
        ZOrder.interleave(lit(0L), lit(3L), 4).as("b"),
        ZOrder.interleave(lit(255L), lit(255L), 8).as("c"))
      .collect().head
    assert(r.getLong(0) == 5L)   // 0b11 even positions -> 0b0101
    assert(r.getLong(1) == 10L)  // 0b11 odd positions  -> 0b1010
    assert(r.getLong(2) == 65535L)
  }

  test("skip-scan equals the plain filter") {
    val path = ZOrder.ensureZordered(spark, sf)
    val got = ZOrder.skipScan(spark, path, 3L, 7L, 19731L, 19738L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("s"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val plain = Tables.events(spark, sf)
      .withColumn("d", datediff(col("ts").cast("date"),
        lit("1970-01-01").cast("date")).cast("long"))
      .where(col("user_id").between(3, 7) && col("d").between(19731, 19738))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("s"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == plain)
  }

  test("stats prune files for a predicate on EITHER dimension") {
    val path = ZOrder.ensureZordered(spark, sf)
    val total = spark.read.parquet(path + "_stats").count()
    assert(total > 4, s"expected a multi-file layout, got $total")
    // narrow user band, all days
    val selU = ZOrder.selectFiles(spark, path, 0L, 3L, 0L, 99999L).size
    // all users, narrow day band
    val selD = ZOrder.selectFiles(spark, path, 0L, 99999L, 19723L, 19729L).size
    assert(selU < total, s"u-band read every file ($selU/$total)")
    assert(selD < total, s"d-band read every file ($selD/$total)")
    // and the skip-scan actually carries fewer input files: the box
    // query touches a strict subset too
    val selBox = ZOrder.selectFiles(spark, path, 3L, 7L, 19731L, 19738L).size
    assert(selBox < total)
  }

  test("append publishes through the sidecar and stays filter-equivalent") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "zapp")
    val path = dir.resolve("zx").toString
    try {
      val ev = Tables.events(spark, sf)
      val base = ev.where(col("user_id") < 8)
      // batch users 28..34 — OUTSIDE the base build's bounds, so grid
      // cells clamp while the stats record true min/max
      val batch = ev.where(col("user_id") >= 8)
        .withColumn("user_id", col("user_id") + 20)
      ZOrder.buildZorder(spark, base, path)
      val statsBefore = spark.read.parquet(path + "_stats").count()
      ZOrder.zorderAppend(spark, path, batch, gen = 1L)
      val statsAfter = spark.read.parquet(path + "_stats").count()
      assert(statsAfter > statsBefore)
      // equality over the union population
      val got = ZOrder.skipScan(spark, path, 0L, 999L, 0L, 99999L).count()
      assert(got == base.count() + batch.count())
      // REDELIVERY of the same generation replaces, never duplicates
      ZOrder.zorderAppend(spark, path, batch, gen = 1L)
      assert(ZOrder.skipScan(spark, path, 0L, 999L, 0L, 99999L).count()
        == got)
      // the appended population is found through the sidecar...
      val gotNew = ZOrder.skipScan(spark, path, 28L, 999L, 0L, 99999L)
        .count()
      assert(gotNew == batch.count())
      // ...and its band prunes to the appended files only (the base
      // files' u_max is 7, far below the band)
      val selNew = ZOrder.selectFiles(spark, path, 28L, 999L, 0L, 99999L)
      assert(selNew.nonEmpty && selNew.size < statsAfter)
    } finally {
      new scala.reflect.io.Directory(dir.toFile).deleteRecursively()
    }
  }

  test("streamed generations land exactly-once and stay queryable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "zstream")
    val path = dir.resolve("zx").toString
    val ckpt = dir.resolve("ckpt").toString
    try {
      val base = Tables.events(spark, sf)
        .select(col("ts"), col("user_id"), col("event_type"))
      graft.operators.ZOrder.buildZorder(spark, base, path)
      val ms = MemoryStream[Int]
      val stream = ms.toDF().select(
        to_timestamp(lit("2024-01-05 12:00:00")).as("ts"),
        (col("value") + 40).as("user_id"),
        lit("streamed").as("event_type"))
      val q = graft.streaming.LayoutMaintenance.attach(stream, path, ckpt)
      try {
        ms.addData(1 to 5: _*); q.processAllAvailable()
        ms.addData(6 to 9: _*); q.processAllAvailable()
      } finally q.stop()
      // every wave is present exactly once, through the sidecar
      val total = graft.operators.ZOrder
        .skipScan(spark, path, 0L, 999L, 0L, 99999L).count()
      assert(total == base.count() + 9)
      // the streamed band prunes to streamed generations' files only
      val stats = spark.read.parquet(path + "_stats")
      assert(stats.select("gen").distinct().count() >= 2)
      val sel = graft.operators.ZOrder
        .selectFiles(spark, path, 41L, 999L, 0L, 99999L)
      assert(sel.nonEmpty && sel.size < stats.count())
    } finally {
      new scala.reflect.io.Directory(dir.toFile).deleteRecursively()
    }
  }
}
