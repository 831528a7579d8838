package graft

import graft.operators.{Knn, MaxSim}
import org.apache.spark.sql.functions._

class MaxSimSpec extends SparkSuite {

  test("1x1 MaxSim degenerates to single-vector cosine kNN") {
    val e = Tables.embeddings(spark, sf)
    // one token per doc, one token per query: Σ max collapses to cos
    val dtokens = e.select(col("vec_id").cast("long").as("doc_id"),
      col("embedding").as("vec"))
    val qtokens = e.where(col("vec_id") < 3)
      .select(col("vec_id").cast("long").as("qid"),
        col("vec_id").as("qtok"), col("embedding").as("qvec"))
    val got = MaxSim.maxsimTopK(dtokens, qtokens, 5)
      .select("qid", "rk", "doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val want = Knn.topK(
      e.select(col("vec_id").as("id"), col("embedding").as("vec")),
      e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      5, Knn.Metric.Cosine)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // same neighbors in the same order; scores equal at the 4dp
    // contract (MaxSim quantizes to micro-units before ranking, kNN
    // ranks unrounded — a tie split differently inside the same 4dp
    // bucket would still be a correct answer, but on this data the
    // orders agree exactly)
    assert(got.map(t => (t._1, t._2, t._3)) ==
      want.map(t => (t._1, t._2, t._3)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) < 1.001e-4, s"$g vs $w")
    }
  }

  test("mean pool of identical token vectors is the vector itself") {
    val e = Tables.embeddings(spark, sf).where(col("vec_id") === 7)
    // 3 copies of the same vector in one doc
    val dtokens = e.select(lit(0L).as("doc_id"), col("embedding").as("vec"))
      .unionAll(e.select(lit(0L).as("doc_id"), col("embedding").as("vec")))
      .unionAll(e.select(lit(0L).as("doc_id"), col("embedding").as("vec")))
    val pooled = MaxSim.meanPool(dtokens).collect()
    val vec = e.select(col("embedding")).collect().head
      .getSeq[Float](0)
    assert(pooled.length == vec.length)
    pooled.foreach { r =>
      assert(r.getLong(2) == 3L)
      val el = vec(r.getInt(1) - 1).toDouble
      assert(math.abs(r.getDouble(3) - el) < 1.001e-4)
    }
  }
}
