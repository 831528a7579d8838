package graft

import graft.operators.{Ann, Knn}
import org.apache.spark.sql.functions._

/** Structural pins for the r11 late wave beyond the DuckDB oracles:
  * the spilled IVF layout's replication factor and single-cell probe,
  * and the multi-query operator's best-of-sub-vectors semantics on a
  * planted fixture.
  */
class R11WaveSpec extends SparkSuite {

  test("ann_ivf_spill: single-cell probe answers stay ranked and bounded") {
    val res = Ann.ivfSpillQuery(spark, sf).collect()
    assert(res.nonEmpty)
    // per query: ranks are 1..k' contiguous, scores non-increasing
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRk = rows.sortBy(_.getInt(1))
      assert(byRk.map(_.getInt(1)).toSeq == (1 to byRk.length).toSeq)
      val scores = byRk.map(_.getDouble(3)).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // the self-match survives the single-cell probe: a query vector
    // is spilled into its own nearest cell, which is also the cell
    // the query probes — rank 1 must be the query itself
    res.filter(_.getInt(1) == 1).foreach { r =>
      assert(r.getLong(2) == r.getLong(0),
        s"query ${r.getLong(0)} lost its self-match under spill@1")
    }
  }

  test("multi-query OR: a doc wins on its BEST sub-vector") {
    import spark.implicits._
    // planted: axis-aligned vectors; query q has intents e1 and e2.
    // docB matches ONLY the second intent — max() semantics must
    // still rank it at cosine 1.0 beside docA (first intent), ahead
    // of docC (neither).
    def v(i: Int): Array[Float] = {
      val a = new Array[Float](4); a(i) = 1.0f; a
    }
    val mixed = Array(0.6f, 0.0f, 0.8f, 0.0f)
    val data = Seq((10L, v(0)), (20L, v(2)), (30L, mixed))
      .toDF("id", "vec")
    val queries = Seq((0L, v(0), v(2))).toDF("qid", "q1", "q2")
    val got = Knn.topKMultiQuery(data, queries, 3).collect()
      .map(r => (r.getInt(1).toLong, r.getLong(2), r.getDouble(3)))
    // both exact intent matches clamp to 1.0 and tie-break by id
    assert(got(0) == ((1L, 10L, 1.0)))
    assert(got(1) == ((2L, 20L, 1.0)))
    // the mixed doc scores its BETTER leg: cos(mixed, e3)=0.8 beats
    // cos(mixed, e1)=0.6
    assert(got(2)._2 == 30L && math.abs(got(2)._3 - 0.8) < 1e-9)
  }

  test("winsorized mean is pulled toward the median vs the raw mean") {
    val rows = graft.operators.Analytics.eventsWinsorized(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95) = (r.getDouble(2), r.getDouble(3))
      val wins = r.getDouble(5)
      assert(p05 <= p95)
      // the winsorized mean must live inside the clip bounds
      assert(wins >= p05 - 1e-9 && wins <= p95 + 1e-9)
    }
  }
}
