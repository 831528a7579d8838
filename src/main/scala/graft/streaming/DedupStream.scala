package graft.streaming

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time half of the dedup
  * surface: as documents arrive (a crawl feed, a WAL of inserts), the
  * first copy of each fingerprint passes through and every later copy
  * is suppressed, so downstream consumers only ever see novel
  * content. The batch operators (Dedup.exact &c.) clean a corpus at
  * rest; this cleans it in motion.
  *
  * State = the fingerprint set, held by Spark's streaming
  * deduplication operator (dropDuplicates on a stream): exactly-once
  * across micro-batches and recoverable from the checkpoint. State
  * grows with DISTINCT content only — at 100 TB of ingest the state
  * is the fingerprint dictionary, not the corpus; when duplicates are
  * known to cluster in time (re-crawls, retry storms),
  * `dropDuplicatesWithinWatermark` bounds it to the event-time window
  * with the same plan shape.
  */
object DedupStream {

  /** First-arrival-wins stream: fingerprint each document, suppress
    * repeats. Works identically on a batch frame (dropDuplicates
    * without the stream just keeps one arbitrary copy per key — the
    * spec feeds deterministic batches so "first" is well-defined).
    */
  def firstSeen(docs: DataFrame): DataFrame =
    docs.withColumn("fp", md5(col("text"))).dropDuplicates("fp")

  /** Batch twin under the DuckDB oracle: the state the stream
    * converges to on the planted-duplicate corpus — one row per
    * fingerprint, its first (minimum) doc id, and how many copies the
    * stream would suppress. Same aggregation shape as the stream's
    * state store: keyed by fp, map-side partial agg.
    */
  def dedupStateQuery(s: SparkSession, dir: String): DataFrame =
    Dedup.corpusWithExactDups(s, dir)
      .withColumn("fp", md5(col("text")))
      .groupBy("fp")
      .agg(min("doc_id").as("first_id"),
        count(lit(1)).as("n_copies"))
      .orderBy("fp")
}
