package graft

import graft.functions.BinaryQuant
import graft.operators.{BinQuant, Knn}
import org.apache.spark.sql.functions._

class BinQuantSpec extends SparkSuite {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
  private def qs = Tables.embeddings(spark, sf).where(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("pack sets exactly the above-mean bits, 32 per word") {
    val mus = Array.fill(64)(0.5)
    // dims 0 and 33 above threshold → bit 0 of word 0, bit 1 of word 1
    val v = Array.tabulate(64)(i => if (i == 0 || i == 33) 1.0f else 0.0f)
    val words = Seq(Tuple1(v)).toDF("vec")
      .select(BinaryQuant.pack(col("vec"), mus).as("c"))
      .collect().head.getSeq[Long](0)
    assert(words == Seq(1L, 2L))
    // exactly at the threshold is NOT above it
    val atMu = Seq(Tuple1(Array.fill(64)(0.5f))).toDF("vec")
      .select(BinaryQuant.pack(col("vec"), mus).as("c"))
      .collect().head.getSeq[Long](0)
    assert(atMu == Seq(0L, 0L))
  }

  test("hamming: identity zero, symmetric, counts flipped bits") {
    val mus = BinQuant.trainMeans(emb)
    val pairs = emb.limit(40).select(col("id"),
        BinaryQuant.pack(col("vec"), mus).as("c"))
    val d = pairs.as("x").crossJoin(pairs.as("y"))
      .select(col("x.id").as("i"), col("y.id").as("j"),
        BinaryQuant.hamming(col("x.c"), col("y.c")).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    d.foreach { case ((i, j), h) =>
      assert(h >= 0 && h <= 64)
      if (i == j) assert(h == 0, s"self-hamming $h for $i")
      else assert(h == d((j, i)), s"asymmetric hamming $i,$j")
    }
    // mismatched word counts are NULL, not an exception
    val bad = Seq((Array(1L), Array(1L, 2L))).toDF("a", "b")
      .select(BinaryQuant.hamming(col("a"), col("b")).as("h"))
      .collect().head
    assert(bad.isNullAt(0))
  }

  test("bq shortlist + exact rerank holds recall vs exact cosine") {
    val viaBq = BinQuant.bqSearch(emb, qs, 10).select("qid", "nn_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Knn.topK(emb, qs, 10, Knn.Metric.Cosine).select("qid", "nn_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = viaBq.intersect(exact).size.toDouble / exact.size
    // 1-bit codes are the coarsest rung: the 4×k Hamming shortlist
    // still recovers most of the exact top-10 after the float rerank
    assert(recall >= 0.5, s"bq recall collapsed: $recall")
  }

  test("deterministic across runs") {
    val a = BinQuant.bqQuery(spark, sf).collect().toSeq
    val b = BinQuant.bqQuery(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("ivf+bq: partition-pruned code-only probe scan, useful recall") {
    import graft.operators.{Ann, Knn}
    val indexed = Ann.ivfBqQuery(spark, sf)
    val rows = indexed.collect()
    assert(rows.length == 50)
    // the probe scan must prune both ways: unprobed cell DIRECTORIES
    // skipped (PartitionFilters) and the float vec column absent from
    // the shortlist scan's ReadSchema (code-only bandwidth)
    val plan = Ann.ivfBqQuery(spark, sf)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(pf.contains("cell") && !pf.contains("PartitionFilters: []"),
      s"no partition pruning on the bq index scan: $pf")
    val codeScan = plan.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("code"))
      .getOrElse("")
    assert(codeScan.nonEmpty && !codeScan.contains("vec"),
      s"shortlist scan reads floats: $codeScan")
    // nprobe=2 of 3 cells + 1-bit codes: still most of the exact
    // top-10 after the rerank
    val exact = Knn.topK(emb, qs, 10, Knn.Metric.Cosine)
      .select("qid", "nn_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"ivf+bq recall collapsed: $recall")
  }
}
