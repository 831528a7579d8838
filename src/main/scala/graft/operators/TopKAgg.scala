package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.UserDefinedFunction

/** One (sort-key, id) candidate. Lower key = better; callers negate
  * similarities to rank descending metrics.
  */
case class ScoredId(key: Double, id: Long)

case class TopKBuf(items: List[ScoredId], n: Int)

case class TopKResult(items: Seq[ScoredId])

/** Bounded top-k as a typed Aggregator — the scale-critical kernel.
  *
  * The reference's k-NN keeps a k-heap inside FAISS
  * (faiss_index.cc:40) on one node. The Spark-native equivalent must
  * NOT be a window `row_number() <= k` (that shuffles all Q×N scored
  * rows); as a Catalyst Aggregator it gets map-side partial
  * aggregation: each input partition reduces to ≤4k candidates per
  * query before the exchange, so the shuffle carries O(Q·k·partitions)
  * rows regardless of table size — the property that keeps exact
  * brute-force k-NN feasible at 100 TB.
  *
  * Ties break on ascending id, so results are deterministic and match
  * the oracle's `ORDER BY key, id`.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKResult] {
  private val cap = math.max(4 * k, 64)

  private def compact(l: List[ScoredId]): List[ScoredId] =
    l.sortBy(s => (s.key, s.id)).take(k)

  override def zero: TopKBuf = TopKBuf(Nil, 0)

  override def reduce(b: TopKBuf, a: ScoredId): TopKBuf = {
    val l = a :: b.items
    val n = b.n + 1
    if (n >= cap) { val c = compact(l); TopKBuf(c, c.length) }
    else TopKBuf(l, n)
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    val c = compact(b1.items ::: b2.items)
    TopKBuf(c, c.length)
  }

  override def finish(b: TopKBuf): TopKResult = TopKResult(compact(b.items))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKResult] = Encoders.product[TopKResult]
}

object TopKAgg {
  /** Untyped-API handle: call as `topK(keyCol, idCol)`; yields a
    * struct with an `items` array<struct<key,id>> sorted best-first.
    */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKAgg(k), Encoders.product[ScoredId])

  /** Per-query candidate shortlist: reduce scored (qid, key, id) rows
    * to the best `n` ids per query — the first stage of every
    * shortlist-then-exact-rerank search (shared by the flat-SQ8 and
    * IVF+SQ8 paths so they cannot drift).
    */
  def shortlist(scored: org.apache.spark.sql.DataFrame,
                n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val agg = topK(n)
    scored.groupBy("qid")
      .agg(agg(col("key"), col("id")).as("top"))
      .select(col("qid"), explode(col("top.items")).as("c"))
      .select(col("qid"), col("c.id").as("id"))
  }
}
