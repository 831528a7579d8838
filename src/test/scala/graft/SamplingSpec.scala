package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {

  private def docs = Tables.documents(spark, sf).select("doc_id", "lang")

  test("sampling decision is invariant under repartitioning") {
    // the reason this operator exists instead of df.sample(): Spark's
    // RNG sampling is seeded per-partition, so a layout change
    // resamples; the hash decision must not move
    val a = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.25), 0.75).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(docs.repartition(17), "doc_id", "lang",
      Map("en" -> 0.25), 0.75).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("stratum rates land near their targets") {
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.25), 0.75)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = kept("en").toDouble / total("en")
    assert(math.abs(enRate - 0.25) < 0.12, s"en rate drifted: $enRate")
    val restRate = (kept - "en").values.sum.toDouble /
      (total - "en").values.sum
    assert(math.abs(restRate - 0.75) < 0.12, s"default rate drifted: $restRate")
  }

  test("rate 1.0 keeps every row, rate 0.0 keeps none") {
    val n = docs.count()
    assert(Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, 1.0).count() == n)
    assert(Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, 0.0).count() == 0)
  }

  test("split is exhaustive, disjoint, and near the requested fractions") {
    val out = Sampling.split(docs, "doc_id", 0.8, 0.1)
    val n = docs.count()
    assert(out.count() == n, "split dropped or duplicated rows")
    val byCat = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCat.keySet == Set("train", "val", "test"))
    assert(math.abs(byCat("train").toDouble / n - 0.8) < 0.1)
    // the same doc always lands in the same split
    val again = Sampling.split(docs.repartition(7), "doc_id", 0.8, 0.1)
      .where(col("split") === "val").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val first = out.where(col("split") === "val").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(again == first)
  }

  test("sampling is a scan-side filter — no shuffle, no UDF") {
    val p = Sampling.stratifiedSample(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "lang",
      Map("en" -> 0.25), 0.75)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sampling shuffles:\n${p.take(1500)}")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"sampling runs a UDF:\n${p.take(1500)}")
  }

  test("export shards form a contiguous token order with budget-sized shards") {
    val budget = 500L
    val rows = Sampling.exportShards(
      Tables.documents(spark, sf).select(col("doc_id"),
        size(org.apache.spark.sql.functions.split(col("text"), " "))
          .as("n_tok")),
      "doc_id", "n_tok", budget)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) // n_tok, start, shard
    assert(rows.nonEmpty)
    // offsets are exactly contiguous: each doc starts where the
    // previous one ended — the two-level prefix sum lost nothing
    rows.sliding(2).foreach {
      case Array((n1, s1, _), (_, s2, _)) => assert(s2 == s1 + n1)
      case _ =>
    }
    assert(rows.head._2 == 0L)
    // shard id is exactly the start-token bucket
    rows.foreach { case (_, start, shard) =>
      assert(shard == start / budget)
    }
    // every shard but the last spans its full budget window: the
    // first doc of shard i+1 starts in bucket i+1, so shard i's docs
    // cover through its boundary (docs may straddle)
    val nShards = rows.map(_._3).max + 1
    val total = rows.last._2 + rows.last._1
    assert(nShards == (total - rows.last._1) / budget + 1)
  }

  test("dsir importance weights: pool-only output, deterministic " +
    "descending cut, and target-like docs outrank target-unlike") {
    import graft.operators.Sampling
    val rows = Sampling.dsirSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.length == 50)
    // the selection pool excludes the target slice
    assert(rows.forall(_._2 != "en"))
    // ranking is by exact integer weight — non-increasing in the cut
    val ws = rows.map(_._4)
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    // replay stability: a second run returns the identical cut
    val again = Sampling.dsirSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.toSeq == again.toSeq)
  }
}
