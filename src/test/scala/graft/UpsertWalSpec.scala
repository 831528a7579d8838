package graft

import graft.operators.{Upsert, WalReplay}
import org.apache.spark.sql.functions._

class UpsertWalSpec extends SparkSuite {
  import spark.implicits._

  test("last-writer-wins keeps exactly the max-version row per key") {
    val log = Seq(
      (1L, "a", 1L), (1L, "b", 3L), (1L, "c", 2L),
      (2L, "x", 1L),
      (3L, "p", 2L), (3L, "q", 1L)).toDF("id", "payload", "version")
    val got = Upsert.lastWriterWins(log, "id", "version")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "b", 3L), (2L, "x", 1L), (3L, "p", 2L)))
  }

  test("snapshot + tail replay equals full replay at any split point") {
    val ev = Tables.events(spark, sf)
    val full = WalReplay.replayComposed(ev, Long.MaxValue).collect().toSeq
    for (split <- Seq(0L, 100L, 5000L)) {
      val composed = WalReplay.replayComposed(ev, split).collect().toSeq
      assert(composed == full, s"split at $split diverges")
    }
  }
}
