package graft

import graft.operators.Analytics
import graft.streaming.{ActivityDay, RollingActiveStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The IVM rolling-actives equivalence: the stream's clip/open delta
  * pairs differ from the batch formulation's boundary rows only by
  * pairs summing to zero at equal t, so serving the maintained delta
  * log must equal the oracled batch dashboard exactly, however the
  * activity days are day-sliced into micro-batches.
  */
class RollingActiveStreamSpec extends SparkSuite {

  private def activityRows(): Seq[ActivityDay] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      .distinct()
      .as[ActivityDay].collect().toSeq.sortBy(a => (a.user_id, a.d))
  }

  private def batchWant(): Seq[(String, Long, Long, Long, Double)] =
    Analytics.eventsRollingActive(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq

  private def runAndServe(waves: Seq[Seq[ActivityDay]], tag: String)
      : Seq[(String, Long, Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), s"rollact$tag")
    val logPath = root.resolve("log").toString
    val ckpt = root.resolve("ckpt").toString
    val stream = MemoryStream[ActivityDay]
    val q = RollingActiveStream.attach(spark, stream.toDS(), logPath, ckpt)
    try {
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
      RollingActiveStream.serve(spark, logPath).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
    } finally {
      q.stop()
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("served delta log equals the oracled batch dashboard") {
    val got = runAndServe(Seq(activityRows()), "one")
    val want = batchWant()
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("day-sliced waves change nothing (clip/open pairs cancel)") {
    val rows = activityRows()
    val days = rows.map(_.d).distinct.sorted
    val cut = days(days.length / 2)
    val waves = Seq(rows.filter(_.d <= cut), rows.filter(_.d > cut))
    assert(runAndServe(waves, "wav") == batchWant())
  }

  test("a redelivered generation overwrites itself (exactly-once)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "rollactgen")
    val logPath = root.resolve("log").toString
    try {
      val batch = Seq(("dau", 10L, 1L), ("w7", 10L, 1L), ("w7", 17L, -1L))
        .toDF("kind", "t", "delta")
      RollingActiveStream.writeGen(batch, 5L, logPath)
      val once = spark.read.parquet(logPath).collect().length
      RollingActiveStream.writeGen(batch, 5L, logPath)
      assert(spark.read.parquet(logPath).collect().length == once)
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }
}
