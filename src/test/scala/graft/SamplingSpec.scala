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
}
