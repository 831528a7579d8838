package graft.streaming

import graft.operators.Search
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The lexical index maintained LIVE — the postings twin of
  * [[IndexMaintenance]]'s IVF loop: a stream of new documents folds
  * into the persisted BM25 index per micro-batch via the
  * touched-buckets insert, while readers keep searching it.
  *
  * Composition of pieces proven separately: the bootstrap is a batch
  * [[Search.bm25BuildIndex]] of the existing corpus (the
  * snapshot-then-tail split), each micro-batch is
  * [[Search.bm25IndexInsert]] (insert-grown ≡ rebuilt, SearchSpec),
  * and a re-delivered batch replaces its own rows instead of
  * duplicating them (the insert's doc_id anti-join), so foreachBatch
  * retries are safe.
  */
object PostingsMaintenance {

  /** Attach the maintenance loop to a document stream
    * (doc_id, text) over an existing index at `indexPath`.
    *
    * RESTART REPAIR (the reference's reload-on-startup discipline): a
    * crash inside a previous insert can leave the sidecars behind the
    * already-published postings (the insert's documented crash
    * window), and the redelivered batch is a stats NO-OP by design
    * (its rows are already present, so dropped == batch and the delta
    * is zero) — redelivery alone can never heal stale sidecars.
    * Re-deriving them from the postings (ground truth) BEFORE the
    * first trigger makes the retry path exact: one index scan per
    * stream (re)start, the same bound the reference's recovery pays.
    */
  def attach(docs: DataFrame, indexPath: String,
             checkpoint: String): StreamingQuery = {
    Search.deriveSidecars(docs.sparkSession, indexPath)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Search.bm25IndexInsert(batch.sparkSession, indexPath, batch)
      }
      .start()
  }
}
