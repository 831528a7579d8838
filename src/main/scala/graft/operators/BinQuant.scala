package graft.operators

import graft.Tables
import graft.functions.{BinaryQuant, VectorDistance}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-quantized (1-bit) brute-force search — the bottom rung of
  * the quantization ladder (SQ8 4×, PQ 64×, BQ 32× with a 1-word
  * Hamming comparison): sign bits vs per-dimension corpus means,
  * Hamming-distance shortlist, exact cosine rerank. Mean-centered
  * sign codes preserve angular order in expectation (the
  * sign-random-projection idea behind [[Ann.lshSearch]], but with
  * the identity basis and a data-driven threshold), so Hamming is
  * the right code-space proxy for a cosine search.
  *
  * The 100 TB rationale is the strongest of the ladder: the scan
  * reads 8 bytes/vector instead of 256 and compares with two
  * xor+popcount ops/row — memory-bandwidth-bound brute force gets
  * ~32× cheaper, and the exact rerank touches only
  * rerank·k·|queries| float vectors (reference FLAT search role,
  * faiss_index.cc:40).
  */
object BinQuant {

  /** Per-dimension corpus mean, 6dp-rounded: ONE posexplode pass,
    * partial-aggregated per dim (shuffle carries dims × partitions
    * rows), dim-many results collected — driver-held training
    * constants, like IVF centroids and the SQ8 (min, max) grid.
    * Rounding makes the threshold order-independent (same rationale
    * as the 6dp Lloyd means): parallel sum orderings differ at
    * ~1e-13 relative, far inside the 1e-6 grid.
    */
  def trainMeans(emb: DataFrame): Array[Double] =
    emb.select(posexplode(col("vec")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(round(avg(col("x").cast("double")), 6).as("mu"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy(_._1)
      .map(_._2)

  /** Per-dim means for the full corpus at `dir`, trained once per dir
    * and shared by every consumer — the Pq.cbCache amortization.
    */
  def cachedMeans(dir: String, emb: => DataFrame): Array[Double] =
    muCache.computeIfAbsent(dir, _ => trainMeans(emb))

  private val muCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Double]]()

  /** Packed-code scan → Hamming shortlist of `rerank·k` per query →
    * exact float cosine rerank to k. Output shape matches
    * [[Knn.topK]] with Metric.Cosine.
    */
  def bqSearch(emb: DataFrame, queries: DataFrame, k: Int,
               rerank: Int = 4): DataFrame = {
    val mus = trainMeans(emb)
    val codes = emb.select(col("id"),
      BinaryQuant.pack(col("vec"), mus).as("code"))
    val qcodes = broadcast(queries.select(col("qid"),
      BinaryQuant.pack(col("qvec"), mus).as("qcode")))
    val scored = codes.crossJoin(qcodes)
      .select(col("qid"),
        BinaryQuant.hamming(col("code"), col("qcode"))
          .cast("double").as("key"),
        col("id"))
      .where(col("key").isNotNull)
    val shortlist = TopKAgg.shortlist(scored, k * rerank)
    // exact rerank touches only the shortlist's float vectors;
    // similarity ranks descending → negate for the lower-is-better heap
    val rescored = shortlist
      .join(emb, "id")
      .join(broadcast(queries), "qid")
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    val fin = TopKAgg.topK(k)
    rescored.groupBy("qid")
      .agg(fin(col("key"), col("id")).as("top"))
      .select(col("qid"), posexplode(col("top.items")))
      .select(col("qid"), (col("pos") + 1).as("rk"),
        col("col.id").as("nn_id"), round(-col("col.key"), 4).as("score"))
      .orderBy("qid", "rk")
  }

  def bqQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    bqSearch(e, q, k = 10)
  }
}
