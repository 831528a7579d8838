package graft

import graft.operators.{Ann, Knn}
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation operators: nDCG of the IVF path and the
  * random-projection candidate generator's rerank quality.
  */
class RankEvalSpec extends SparkSuite {

  test("ndcg: per-query values in (0,1], 1 exactly when order matches") {
    val rows = Ann.ndcgReport(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val ndcg = r.getDouble(3)
      assert(ndcg > 0.0 && ndcg <= 1.0)
      // self-query: the query vector is in the corpus, so the exact
      // top-1 is the query itself; any sane index finds it
      assert(r.getDouble(1) > 0.0) // dcg
      assert(r.getDouble(2) > r.getDouble(1) - 1e-9) // idcg >= dcg
    }
  }

  test("rp-knn: recall@10 vs brute cosine clears the floor") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(spark, sf).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Knn.topK(e, q, 10, Knn.Metric.Cosine)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rp = Ann.rpKnnQuery(spark, sf)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = rp.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.6, s"rp recall@10 $recall below floor")
  }

  test("rp-knn: projection matrix is deterministic and ±1") {
    val a = Ann.rpSigns
    val b = Ann.rpSigns
    assert(a.length === Ann.RpDims && a.head.length === 64)
    assert(a.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }
}
