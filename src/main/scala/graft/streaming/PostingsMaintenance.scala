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
  * retries are safe. A crash between the insert's three publishes is
  * repaired by [[Search.deriveSidecars]] — postings are ground truth.
  */
object PostingsMaintenance {

  /** Attach the maintenance loop to a document stream
    * (doc_id, text) over an existing index at `indexPath`.
    */
  def attach(docs: DataFrame, indexPath: String,
             checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Search.bm25IndexInsert(batch.sparkSession, indexPath, batch)
      }
      .start()
}
