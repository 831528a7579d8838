package graft

import graft.operators.Sequence
import org.apache.spark.sql.functions._

class SequenceSpec extends SparkSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("pattern match: in-gap chain counts, out-of-gap chain does not") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view → click (+30m) → purchase (+30m): one match
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:30:00")),
      (1L, "purchase", ts("2024-01-01 11:00:00")),
      // user 2: click arrives 2h after the view — gap=1h breaks it
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 12:00:00")),
      (2L, "purchase", ts("2024-01-01 12:30:00")),
      // user 3: two purchases off one qualifying click — both count
      (3L, "view", ts("2024-01-01 09:00:00")),
      (3L, "click", ts("2024-01-01 09:10:00")),
      (3L, "purchase", ts("2024-01-01 09:20:00")),
      (3L, "purchase", ts("2024-01-01 09:40:00")),
      // user 4: purchase BEFORE any click never matches
      (4L, "purchase", ts("2024-01-01 09:00:00")),
      (4L, "view", ts("2024-01-01 09:10:00")),
      (4L, "click", ts("2024-01-01 09:20:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Sequence.patternMatchOn(ev, gapSeconds = 3600L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 3L -> 2L))
  }

  test("pattern match: same-timestamp stages are order-blind (RANGE tie rule)") {
    import spark.implicits._
    // click shares the view's exact timestamp; purchase shares the
    // click's — RANGE frames include same-ts rows, so this matches
    val ev = Seq(
      (1L, "purchase", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Sequence.patternMatchOn(ev, gapSeconds = 60L).collect()
    assert(out.length === 1 && out(0).getLong(1) === 1L)
  }

  test("pareto: banded frontier equals in-memory brute-force dominance") {
    import spark.implicits._
    // deterministic pseudo-random points incl. duplicated frontier
    // point and a same-price dominated pair
    val pts = (0 until 200).map { i =>
      val price = (i * 37 % 97) + (i % 5) * 0.25
      val size = (i * 53 % 41).toLong
      (i.toLong, price, size.toInt)
    } ++ Seq((500L, 1.0, 40), (501L, 1.0, 40), (502L, 1.0, 39))
    val df = pts.toDF("p_partkey", "p_retailprice", "p_size")
    val got = Sequence.paretoOn(df, bands = 8)
      .collect().map(r => r.getLong(0)).toSet
    val want = pts.filter { case (_, p, s) =>
      !pts.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }
    }.map(_._1).toSet
    assert(got === want)
    assert(want.contains(500L) && want.contains(501L) &&
      !want.contains(502L))
  }

  test("cooccurrence: PMI is symmetric in construction and respects support") {
    val out = Sequence.cooccurrence(spark, sf, minPairDays = 1L).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1)) // canonical orientation
      assert(r.getLong(2) >= 1L)
    }
  }
}
