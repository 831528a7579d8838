package graft

import graft.operators.{Sampling, Sketch}
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSuite {

  private def events = Tables.events(spark, sf)
    .select("event_type", "user_id")

  test("kmv estimate tracks the exact distinct count") {
    val est = Sketch.kmvDistinct(events, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (t, nd) =>
      val (nSeen, e) = est(t)
      if (nd < Sketch.K) {
        // below k the sketch is exact by construction
        assert(nSeen == nd && e == nd.toDouble, s"$t: $e vs exact $nd")
      } else {
        assert(nSeen == Sketch.K)
        // k=64 → ~13% standard error; allow 3 sigma
        assert(math.abs(e - nd) <= 0.4 * nd, s"$t: est $e vs exact $nd")
      }
    }
  }

  test("kmv is invariant under repartitioning (merge correctness)") {
    val a = Sketch.kmvDistinct(events, "event_type", "user_id").collect().toSeq
    val b = Sketch.kmvDistinct(
      Tables.events(spark, sf).select("event_type", "user_id").repartition(13),
      "event_type", "user_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("kmv dedups repeated values without a distinct") {
    // duplicating the input must not change any estimate: set-state
    // semantics absorb repeats (the property that lets the aggregate
    // run WITHOUT a pre-shuffle distinct)
    val doubled = events.unionAll(events)
    val a = Sketch.kmvDistinct(events, "event_type", "user_id").collect().toSeq
    val b = Sketch.kmvDistinct(doubled, "event_type", "user_id").collect().toSeq
    assert(a == b)
  }

  test("kmv rollup: global row equals a direct global sketch") {
    val rollup = Sketch.kmvRollup(events, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // merging per-group sketches must land on exactly what sketching
    // the ungrouped stream would produce — the mergeability property
    val direct = Sketch.kmvDistinct(
      events.select(lit("x").as("g"), col("user_id")), "g", "user_id")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    assert(rollup("__all__") == direct,
      s"rollup ${rollup("__all__")} vs direct $direct")
    // per-group rows unchanged by the rollup packaging
    val per = Sketch.kmvDistinct(events, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    per.foreach { case (g, v) => assert(rollup(g) == v) }
  }

  test("weighted sample: layout-invariant, near-budget, length-biased") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val w = docs.agg(sum(col("n_chars").cast("long"))).collect()(0).getLong(0)
    val kept = Sampling.weightedSample(docs, "doc_id", "n_chars", 150.0, w)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.weightedSample(docs.repartition(11), "doc_id",
        "n_chars", 150.0, w)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2, "sampling decision moved under repartition")
    // E[|sample|] = budget (when no p clamps at 1); binomial 4-sigma
    assert(math.abs(ids.size - 150.0) < 50, s"sample size ${ids.size}")
    // PPS property: kept docs are longer on average than the corpus
    val avgKept = kept.agg(avg("n_chars")).collect()(0).getDouble(0)
    val avgAll = docs.agg(avg("n_chars")).collect()(0).getDouble(0)
    assert(avgKept > avgAll, s"kept avg $avgKept !> corpus avg $avgAll")
  }

  test("hist quantile: estimate within a bin of exact, merge ≡ direct") {
    val docs = Tables.documents(spark, sf).select("lang", "n_chars")
    val est = Sketch.histQuantile(docs, "lang", "n_chars")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // exact percentiles (ceil-rank definition matching the sketch's t)
    val exact = docs.groupBy("lang").agg(
        expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (g, (n, p50, p95)) =>
      val (e50, e95, en) = exact(g)
      assert(n == en)
      // interpolated histogram estimate lands within one 64-wide bin
      // of the exact order statistic
      assert(math.abs(p50 - e50) <= 64.0, s"$g p50 $p50 vs exact $e50")
      assert(math.abs(p95 - e95) <= 64.0, s"$g p95 $p95 vs exact $e95")
    }
    // MERGE: histograms from disjoint corpus halves summed = direct —
    // re-aggregating the union must reproduce the single-pass result
    // regardless of how the data was split (the rollup property)
    val half1 = docs.where(col("n_chars") % 2 === 0)
    val half2 = docs.where(col("n_chars") % 2 =!= 0)
    val merged = Sketch.histQuantile(half1.unionByName(half2),
      "lang", "n_chars").collect().toSeq
    val direct = Sketch.histQuantile(docs, "lang", "n_chars")
      .collect().toSeq
    assert(merged == direct)
  }

  test("kmv set ops are exact below k") {
    import org.apache.spark.sql.functions._
    // sf0.001 high-value audiences are far below k=64, so every
    // estimator must return the true set sizes
    val df = Tables.events(spark, sf).where(col("value") > 200)
      .select("event_type", "user_id")
    val est = operators.Sketch.kmvSetOps(df, "event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6)))
    assert(est.nonEmpty)
    val sets = df.collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    est.foreach { case (a, b, estA, estB, estU, j, estI) =>
      val (sa, sb) = (sets(a), sets(b))
      assert(estA == sa.size.toDouble && estB == sb.size.toDouble)
      assert(estU == (sa ++ sb).size.toDouble)
      val inter = (sa & sb).size.toDouble
      val trueJ = inter / (sa ++ sb).size
      assert(math.abs(j - trueJ) < 1.001e-4, s"($a,$b) j=$j true=$trueJ")
      assert(math.abs(estI - inter) < 0.501, s"($a,$b) i=$estI true=$inter")
    }
  }

  test("count-min never undercounts and is exact for clear winners") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
    val est = Sketch.cmsTopK(toks, "tok", 15)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (t, e) =>
      // one-sided error: min over rows can only ADD collisions
      assert(e >= exact(t), s"$t: est $e under exact ${exact(t)}")
      // 4 independent rows × width 1024 on a vocab ≪ width·depth:
      // collisions in ALL four rows for the same term are rare enough
      // that the top terms' estimates stay within the collision bound
      // of the emptiest row (loose sanity bound, not a proof)
      assert(e <= exact(t) + exact.values.sum / 1024 * 4,
        s"$t: est $e far above exact ${exact(t)}")
    }
    // the sketch's top-k must contain the true heaviest term
    val topTrue = exact.maxBy { case (t, n) => (n, t) }._1
    assert(est.contains(topTrue))
  }

  test("hll estimate tracks the exact distinct count") {
    val est = Sketch.hllDistinct(events, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    exact.foreach { case (t, nd) =>
      // m=64 → ~1.04/√64 = 13% standard error; allow 3 sigma
      assert(math.abs(est(t) - nd) <= 0.4 * nd,
        s"$t: est ${est(t)} vs exact $nd")
    }
  }

  test("hll linear-counting branch is near-exact at small cardinality") {
    import spark.implicits._
    // 20 distinct values in one group: raw ≤ 2.5m with empty
    // registers → the ln branch, which is near-exact down here
    val small = (0 until 200).map(i => ("g", s"v${i % 20}"))
      .toDF("grp", "v")
    val out = Sketch.hllDistinct(small, "grp", "v").collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) > 0, "some registers must be empty")
    assert(math.abs(out(0).getDouble(2) - 20.0) <= 4.0,
      s"linear counting est ${out(0).getDouble(2)} vs exact 20")
  }

  test("hll is invariant under repartitioning (merge correctness)") {
    val a = Sketch.hllDistinct(events, "event_type", "user_id")
      .collect().toSeq
    val b = Sketch.hllDistinct(
      Tables.events(spark, sf).select("event_type", "user_id")
        .repartition(13),
      "event_type", "user_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("hll rollup: global row equals a direct global sketch") {
    val roll = Sketch.hllRollup(events, "event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val all = roll.filter(_._1 == "__all__")
    assert(all.length == 1)
    val direct = Sketch.hllDistinct(
        events.select(lit("__all__").as("g"), col("user_id")),
        "g", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(all.toSeq == direct.toSeq,
      "register-wise max merge must equal the direct sketch")
    // per-group rows match the standalone per-group sketch
    val per = Sketch.hllDistinct(events, "event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(roll.filter(_._1 != "__all__").toSeq == per.toSeq)
  }

  test("temperature mix: shares sum to 1, boost anti-monotone in size") {
    val rows = Sketch.temperatureMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3)
    // α<1 flattens: the smallest source is boosted at least as much
    // as the largest, and every boost is positive
    val bySize = rows.sortBy(_._2)
    assert(bySize.head._5 >= bySize.last._5)
    assert(rows.forall(_._5 > 0.0))
  }
}
