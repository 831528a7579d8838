package graft

import graft.operators.{Knn, Quant}
import org.apache.spark.sql.functions._

class QuantSpec extends SparkSuite {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
  private def qs = Tables.embeddings(spark, sf).where(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("codes span [0,255] and training bounds round-trip") {
    val (mins, maxs) = Quant.trainMinMax(emb)
    assert(mins.length == 64 && maxs.length == 64)
    assert(mins.indices.forall(i => mins(i) <= maxs(i)))
    // a vector AT the bounds encodes to the grid extremes
    val lo = mins.map(_.toFloat)
    val hi = maxs.map(_.toFloat)
    val codes = Seq(Tuple1(lo), Tuple1(hi)).toDF("vec")
      .select(graft.functions.Quantize.encode(col("vec"), mins, maxs).as("c"))
      .collect().map(_.getAs[Array[Byte]](0))
    assert(codes(0).forall(_ == 0))
    // max encodes to 255 wherever the dimension has width
    assert(codes(1).indices.forall(i =>
      (codes(1)(i) & 0xff) == (if (maxs(i) > mins(i)) 255 else 0)))
  }

  test("quantized code distance approximates float L2") {
    val (mins, maxs) = Quant.trainMinMax(emb)
    val a = emb.limit(50)
    val pairs = a.as("x").crossJoin(a.as("y"))
      .where(col("x.id") < col("y.id"))
      .select(
        graft.functions.VectorDistance.l2(col("x.vec"), col("y.vec")).as("exact"),
        graft.functions.Quantize.l2(
          graft.functions.Quantize.encode(col("x.vec"), mins, maxs),
          graft.functions.Quantize.encode(col("y.vec"), mins, maxs),
          mins, maxs).as("approx"))
      .collect()
    // 8-bit grid error per dim ≤ scale/2; aggregate relative error small
    pairs.foreach { r =>
      val (e, q) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(e - q) <= 0.02 * e + 0.05, s"exact $e vs sq8 $q")
    }
  }

  test("sq8 shortlist + exact rerank recovers the exact top-k") {
    val viaSq8 = Quant.sq8Search(emb, qs, 10).select("qid", "nn_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Knn.topK(emb, qs, 10, Knn.Metric.L2).select("qid", "nn_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = viaSq8.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"sq8 recall collapsed: $recall")
  }

  test("deterministic across runs") {
    val a = Quant.sq8Query(spark, sf).collect().toSeq
    val b = Quant.sq8Query(spark, sf).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("ivf+sq8: pruned code-only probe scan, useful recall, deterministic") {
    import graft.operators.Ann
    val out = Ann.ivfSq8Query(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // recall vs exact cosine top-k (the rerank metric): quantized
    // probing of 2 cells must keep useful recall
    val exact = Knn.topK(emb, qs, 10, Knn.Metric.Cosine)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    // same floor as plain IVF: the code-space COSINE shortlist (same
    // metric as the rerank) loses nothing beyond cell-probing + 8-bit
    // rounding
    assert(recall >= 0.5, s"ivf+sq8 recall collapsed: $recall")
    // the probe scan reads codes, never the float vectors: some scan's
    // ReadSchema must contain code without vec, with partition pruning
    val plan = Ann.ivfSq8Query(spark, sf)
      .queryExecution.executedPlan.toString
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.exists(l => l.contains("code") && !l.contains("vec")),
      s"probe scan decodes float vectors:\n${reads.mkString("\n")}")
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("cell") &&
        !l.contains("PartitionFilters: []")),
      "index scan not partition-pruned")
    // deterministic
    assert(Ann.ivfSq8Query(spark, sf).collect().toSeq == rows.toSeq)
  }

  test("ivf+mrl: pruned prefix-only probe scan, useful recall") {
    import graft.operators.Ann
    val rows = Ann.ivfMrlQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    // recall vs exact cosine top-k: a 16-of-64-dim shortlist over 2
    // probed cells must keep useful recall (same floor as the
    // quantized rungs)
    val exact = Knn.topK(emb, qs, 10, Knn.Metric.Cosine)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"ivf+mrl recall collapsed: $recall")
    // the probe scan reads the prefix column, never the full
    // vectors, and is partition-pruned
    val plan = Ann.ivfMrlQuery(spark, sf)
      .queryExecution.executedPlan.toString
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.exists(l => l.contains("pre") && !l.contains("vec")),
      s"probe scan reads full vectors:\n${reads.mkString("\n")}")
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("cell") &&
        !l.contains("PartitionFilters: []")),
      "mrl index scan not partition-pruned")
    // deterministic
    assert(Ann.ivfMrlQuery(spark, sf).collect().toSeq == rows.toSeq)
  }

  test("quant advisor emits every method row with a single-reference " +
    "ground truth (r16 restructure)") {
    val rows = Quant.quantAdvisor(spark, sf).collect()
    // the spec-frame left join must keep a row per compared method
    // even if a method scores ZERO hits (the old per-leg global agg
    // guaranteed this; the groupBy form alone would drop such rows)
    assert(rows.map(_.getAs[String]("method")).toSet ==
      Set("bq", "sq8", "pq", "pq_res", "opq", "mrl"))
    assert(rows.forall(_.getAs[Long]("hits") >= 0))
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 6))
    // the single gt evaluation must not multiply the brute-force
    // subtree: the multiplied (pre-r16) plan carried ~3x the TopKAgg
    // mentions (each gt re-evaluation is a corpus-side heap agg);
    // bound well under that while tolerating per-leg heaps
    val plan = Quant.quantAdvisor(spark, sf)
      .queryExecution.executedPlan.toString.toLowerCase
    val knnAggs = "topkagg".r.findAllIn(plan).size
    assert(knnAggs <= 60,
      s"ground-truth/leg kNN subtrees multiplied: $knnAggs TopKAgg mentions")
  }

  test("opq recall report keeps both method rows (r16 restructure)") {
    val rows = graft.operators.Pq.opqRecallReport(spark, sf).collect()
    assert(rows.map(_.getAs[String]("method")).toSeq == Seq("opq", "pq"))
    assert(rows.forall(_.getAs[Long]("hits") >= 0))
  }
}
