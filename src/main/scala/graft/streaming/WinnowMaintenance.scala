package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The WINNOWING FINGERPRINT INDEX maintained LIVE — 17th streaming
  * structure, closing the loop the signature index already has
  * (16d): a stream of corpus arrivals and tombstones folds into the
  * bucketed fingerprint table per micro-batch, so incremental
  * positional dedup ([[Dedup.winnowIncremental]]) always joins
  * arriving batches against a CURRENT index under continuous ingest.
  *
  * Identical composition to [[SignatureMaintenance]] (proven pieces,
  * same crash/redelivery story): per micro-batch the CROSS-OP winner
  * per id is decided by version BEFORE either op applies (an id
  * upserted then deleted in one batch must not resurrect), upserts
  * re-fingerprint only the batch and rewrite only touched doc-hash
  * buckets with row replacement, tombstones drop their ids' rows.
  */
object WinnowMaintenance {

  /** Fold one micro-batch of (doc_id, text, version, op) log rows
    * into the index — batch-callable for direct testing.
    */
  def fold(indexPath: String)(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val s = batch.sparkSession
    import org.apache.spark.sql.functions._
    val winner = batch.groupBy("doc_id")
      .agg(max_by(struct(col("text"), col("op")), col("version")).as("w"))
      .select(col("doc_id"), col("w.text").as("text"), col("w.op").as("op"))
      .localCheckpoint(true)
    val ups = winner.where(col("op") =!= "delete").select("doc_id", "text")
    val dels = winner.where(col("op") === "delete").select("doc_id")
    if (!ups.isEmpty) Dedup.winnowIndexUpsert(s, indexPath, ups)
    if (!dels.isEmpty) Dedup.winnowIndexDelete(s, indexPath, dels)
  }

  /** Attach the maintenance loop to a document-log stream over an
    * existing index at `indexPath`.
    */
  def attach(log: DataFrame, indexPath: String,
             checkpoint: String): StreamingQuery =
    log.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(fold(indexPath) _)
      .start()
}
