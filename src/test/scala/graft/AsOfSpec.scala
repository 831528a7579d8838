package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val left = {
    import spark.implicits._
    Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "p1"),
      (2L, 10L, ts("2024-01-01 12:00:00"), "p2"),
      (3L, 20L, ts("2024-01-01 09:00:00"), "p3"), // before any right row
      (4L, 30L, ts("2024-01-01 09:30:00"), "p4")  // key with no right rows
    ).toDF("event_id", "user_id", "ts", "tag")
  }

  private lazy val right = {
    import spark.implicits._
    Seq(
      (10L, ts("2024-01-01 09:00:00"), 1.0),
      (10L, ts("2024-01-01 10:00:00"), 2.0), // exactly at left #1's instant
      (10L, ts("2024-01-01 11:00:00"), 3.0),
      (20L, ts("2024-01-01 09:30:00"), 9.0)  // after left #3
    ).toDF("user_id", "rts", "rv")
  }

  private def run(): Map[Long, (Option[java.sql.Timestamp], Option[Double])] =
    AsOf.asofJoin(left, right, "user_id", "ts", "rts")
      .collect()
      .map(r => r.getLong(0) -> (
        Option(r.getAs[java.sql.Timestamp]("rts")),
        Option(r.getAs[Any]("rv")).map(_.asInstanceOf[Double])))
      .toMap

  test("picks the latest right row at-or-before each left time, per key") {
    val out = run()
    // left #1 at 10:00 sees the 10:00 right row (inclusive >=), not 09:00
    assert(out(1L) == (Some(ts("2024-01-01 10:00:00")), Some(2.0)))
    // left #2 at 12:00 sees 11:00 (the latest before it), not 10:00
    assert(out(2L) == (Some(ts("2024-01-01 11:00:00")), Some(3.0)))
  }

  test("left rows with no preceding right row keep NULL right columns") {
    val out = run()
    assert(out(3L) == ((None, None)), "right row from the future leaked")
    assert(out(4L) == ((None, None)), "row for a key with no right rows")
  }

  test("every left row survives (left-outer), no row is duplicated") {
    val rows = AsOf.asofJoin(left, right, "user_id", "ts", "rts")
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(rows.sorted == Seq(1L, 2L, 3L, 4L))
  }

  test("plan is one key-shuffle + sort — no pairwise join expansion") {
    val p = AsOf.asofJoin(left, right, "user_id", "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of fell back to a join:\n${p.take(2000)}")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, // local frames produce one per union leg pre-AQE
      s"too many exchanges ($exchanges):\n${p.take(2000)}")
    assert(p.contains("Window"), "expected the window-merge formulation")
  }
}
