package graft

import graft.operators.{Snapshot, WalReplay}
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSuite {

  test("parquet snapshot + WAL tail resume equals full replay") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "snap")
      .toString
    try {
      val ev = Tables.events(spark, sf)
      val cut = 500L
      Snapshot.take(ev, cut, dir)

      val resumed = Snapshot.resume(spark, dir, ev, cut)
        .select(col("user_id"), col("n_events"),
          round(col("sum_value"), 4).as("sum_value"),
          round(col("last_value"), 4).as("last_value"))
        .orderBy("user_id").collect().toSeq

      val full = WalReplay.replayComposed(ev, Long.MaxValue)
        .collect().toSeq

      assert(resumed == full)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("snapshot persists across sessions of the state schema") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "snap")
      .toString
    try {
      Snapshot.take(Tables.events(spark, sf), 200L, dir)
      val back = spark.read.parquet(dir)
      assert(back.columns.toSet ==
        Set("user_id", "n_events", "sum_value", "last_value", "_lk"))
      assert(back.count() > 0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
