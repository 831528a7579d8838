package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val points = {
    import spark.implicits._
    Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // exactly at a start
      (2L, 10L, ts("2024-01-01 11:30:00")), // inside
      (3L, 10L, ts("2024-01-01 12:00:00")), // exactly at an end
      (4L, 10L, ts("2024-01-01 13:00:00")), // in a gap — no match
      (5L, 20L, ts("2024-01-01 11:00:00")), // right key, other user
      (6L, 10L, ts("2024-01-03 09:00:00"))  // bucket far away
    ).toDF("pid", "user_id", "ts")
  }

  private lazy val intervals = {
    import spark.implicits._
    Seq(
      (100L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      (101L, 10L, ts("2024-01-01 14:00:00"), ts("2024-01-01 15:00:00")),
      (102L, 20L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00"))
    ).toDF("iid", "user_id", "s_start", "s_end")
  }

  test("banded join equals semantics: inclusive bounds, key match, gaps empty") {
    val out = RangeJoin.pointInInterval(points, intervals, "user_id",
      "ts", "s_start", "s_end", bucketSeconds = 1800L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 100L), (2L, 100L), (3L, 100L), (5L, 102L)))
  }

  test("banded join equals the naive inequality join on real data") {
    val ev = Tables.events(spark, sf)
    val iv = ev.groupBy(col("user_id"),
        window(col("ts"), "2 hours").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s_start"),
        // shrink so intervals don't tile the timeline completely
        (col("w.start") + expr("INTERVAL 90 MINUTES")).as("s_end"),
        col("n"))
    val p = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val banded = RangeJoin.pointInInterval(p, iv, "user_id", "ts",
      "s_start", "s_end", bucketSeconds = 3600L)
      .select("event_id", "s_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val naive = p.join(iv, p("user_id") === iv("user_id") &&
        p("ts") >= iv("s_start") && p("ts") <= iv("s_end"))
      .select("event_id", "s_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(banded == naive && banded.nonEmpty)
  }

  test("plan is an equi-join on (key, bucket) — no nested-loop join") {
    val p = RangeJoin.sessionAttributionQuery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join fell back to nested loop:\n${p.take(2000)}")
  }
}
