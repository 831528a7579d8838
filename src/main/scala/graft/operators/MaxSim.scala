package graft.operators

import graft.Tables
import graft.functions.VectorDistance
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Late-interaction (MaxSim) retrieval — the multi-vector scoring
  * model (ColBERT, Khattab & Zaharia SIGIR'20) production vector
  * stores ship beside single-vector kNN: a document is a BAG of token
  * vectors, a query likewise, and
  * score(q, d) = Σ_{qt ∈ q} max_{dt ∈ d} cos(qt, dt) —
  * each query token finds its best-matching document token, and the
  * per-token evidence sums. Single-vector search (reference
  * faiss_index.cc:40 over one embedding per id) is the degenerate
  * 1×1 case.
  *
  * Relational shape, and why it scales: the query side is
  * request-sized and broadcasts; the corpus token table streams
  * through ONE scan; the (qid, qtok, doc) max and the (qid, doc) sum
  * are both algebraic aggregates with map-side partial aggregation
  * (the max collapses per-partition before the exchange), so the one
  * data-sized shuffle carries at most Q·Tq candidates per doc — the
  * scatter-gather every ColBERT serving system runs, with Spark's
  * partial aggregation playing the per-shard reducer. Final ranking
  * is the [[TopKAgg]] heap: Q·k rows to the driver-side sort, never a
  * window over all docs.
  *
  * Determinism: each per-(qtok, doc) max cosine is 4dp-quantized to
  * INTEGER micro-units before the sum (round is monotone, so
  * quantize-then-max ≡ max-then-quantize; the sum is then exact
  * BIGINT arithmetic — the embed_cluster_stats rule), which makes
  * even the fused scores oracle-checkable bit-for-bit.
  */
object MaxSim {

  /** Top-k docs per query under the MaxSim score.
    *
    * @param dtokens (doc_id, vec) corpus token vectors
    * @param qtokens (qid, qtok, qvec) query token vectors
    *                (request-sized; broadcast)
    * @return (qid, rk 1..k, doc_id, score) — score is the sum of 4dp
    *         per-token max cosines; ties broken on ascending doc_id
    */
  def maxsimTopK(dtokens: DataFrame, qtokens: DataFrame,
                 k: Int): DataFrame = {
    val perTok = dtokens.crossJoin(broadcast(qtokens))
      .select(col("qid"), col("qtok"), col("doc_id"),
        VectorDistance.cosine(col("vec"), col("qvec")).as("cos"))
      .where(col("cos").isNotNull)
      // micro-units BEFORE max: monotone, so identical to rounding
      // the max — and the downstream sum becomes exact integer math
      .groupBy("qid", "qtok", "doc_id")
      .agg(max(expr("cast(round(cos * 10000) as bigint)")).as("mu"))
    val scored = perTok.groupBy("qid", "doc_id")
      .agg(sum(col("mu")).as("su"))
    val agg = TopKAgg.topK(k)
    scored.groupBy("qid")
      // heap key is lower-is-better: negate the integer score; the
      // (key, id) total order makes ties land on ascending doc_id
      .agg(agg((-col("su")).cast("double"), col("doc_id")).as("top"))
      .select(col("qid"), posexplode(col("top.items")))
      .select(col("qid"), (col("pos") + 1).as("rk"),
        col("col.id").as("doc_id"),
        (-col("col.key") / 10000.0).as("score"))
      .orderBy("qid", "rk")
  }

  /** Surface query: token vectors synthesized from the embeddings
    * table by id arithmetic — docs of 8 consecutive vectors
    * (vec_id div 8), queries = the first 3 groups of 4 (vec_id div 4
    * over vec_id < 12). Top-5 docs per query.
    */
  def maxsimQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val dtokens = e.select(expr("cast(vec_id as bigint) div 8").as("doc_id"),
      col("embedding").as("vec"))
    val qtokens = e.where(col("vec_id") < 12)
      .select(expr("cast(vec_id as bigint) div 4").as("qid"),
        col("vec_id").as("qtok"), col("embedding").as("qvec"))
    maxsimTopK(dtokens, qtokens, 5)
  }
}
