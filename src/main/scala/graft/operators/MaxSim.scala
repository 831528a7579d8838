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

  /** MEAN-POOLING the other direction — collapse a doc's token
    * vectors into ONE doc vector (the sentence-embedding default;
    * what a RAG pipeline runs on chunk embeddings to index whole
    * docs): pooled[pos] = mean over the doc's token vectors at that
    * dimension. posexplode + (doc, pos)-keyed aggregate — map-side
    * partial agg does the per-partition sums, the exchange carries
    * docs×dims rows. Per-element values are 6dp-quantized to integer
    * micro-units before the sum (exact BIGINT totals), and the mean
    * is ONE division of two exact integers — bit-deterministic on
    * any engine, so the pooled vectors themselves are oracle-checked.
    *
    * @return (doc_id, pos 1-based, n_vecs, pooled 4dp)
    */
  def meanPool(dtokens: DataFrame): DataFrame =
    dtokens
      .select(col("doc_id"), posexplode(col("vec")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        expr("cast(round(cast(col as double) * 1000000) as bigint)")
          .as("micro"))
      .groupBy("doc_id", "pos")
      .agg(count(lit(1)).as("n_vecs"), sum("micro").as("sm"))
      .select(col("doc_id"), col("pos"), col("n_vecs"),
        round(col("sm").cast("double") /
          (col("n_vecs") * 1000000L).cast("double"), 4).as("pooled"))
      .orderBy("doc_id", "pos")

  /** Surface query: pooled doc vectors for the first 16 MaxSim docs
    * (vec_id div 8 < 16) — long form (doc_id, pos, pooled), the
    * shape a downstream indexer pivots or collects.
    */
  def meanPoolQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    meanPool(e.select(expr("cast(vec_id as bigint) div 8").as("doc_id"),
        col("embedding").as("vec"))
      .where(col("doc_id") < 16))
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
