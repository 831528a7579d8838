package graft.streaming

import graft.functions.VectorDistance
import graft.operators.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** SEMDEDUP MAINTAINED LIVE (r13) — the streaming loop over the
  * frozen-centroid arrival path (`Dedup.semDedupIncremental`'s
  * semantics) against the MAINTAINED cell-partitioned IVF index:
  * each micro-batch of embedding arrivals is
  *   1. assigned under the index's STORED centroids
  *      ([[Ann.assignUnderStored]] — arrivals never re-train the
  *      quantizer),
  *   2. scored against ONLY the touched cells' current members plus
  *      earlier-in-batch mates (per-arrival work O(batch ×
  *      cell-size + in-batch collisions), corpus never re-paired),
  *   3. drops written to `dropDir/batch=<id>` with OVERWRITE — the
  *      foreachBatch redelivery discipline: a retried batch rewrites
  *      its own directory byte-identically,
  *   4. survivors LWW-upserted into the index
  *      ([[Ann.ivfIndexUpsert]] — touched cells only; redelivered
  *      survivors replace their own rows, so the index converges).
  * The maintained structure therefore IS the deduplicated corpus: a
  * later copy of a DROPPED doc still drops, because the drop's
  * keeper (the surviving original) is in the index — exactly the
  * keep-first contract the batch operator enforces in one shot.
  */
object SemDedupMaintenance {

  /** Fold one micro-batch of (id, vec) arrivals — batch-callable for
    * direct testing. `tau` is the cosine drop bar.
    */
  def fold(indexPath: String, dropDir: String, tau: Double = 0.35)
          (batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val s = batch.sparkSession
    // One row per id within the batch. With a `version` column this
    // is true LWW (max_by, mirroring ivfIndexUpsert's discipline);
    // without one, duplicate ids inside a single micro-batch have no
    // defined order — dropDuplicates picks an arbitrary row, so a
    // versionless source must not emit two payloads for one id in
    // one batch (redelivery could pick the other and break the
    // byte-identical drop-dir rewrite).
    val oneRow =
      if (batch.columns.contains("version"))
        batch.groupBy("id")
          .agg(max_by(col("vec"), col("version")).as("vec"))
      else batch.dropDuplicates("id").select("id", "vec")
    val aB = Ann.assignUnderStored(s, indexPath, oneRow)
      .select(col("id"), col("vec"), col("cell"))
      .localCheckpoint(true)
    val cells = aB.select("cell").distinct().collect().map(_.getLong(0))
    val idx = s.read.parquet(indexPath)
      .where(col("cell").isin(cells.toIndexedSeq: _*))
      .select(col("id").as("pid"), col("vec").as("pvec"),
        col("cell").cast("long").as("cell"))
    // pid =!= id: on foreachBatch redelivery the first delivery's
    // survivors are ALREADY in the index (step 4 upserted them), so
    // without the guard a redelivered survivor pairs with its own
    // row at cosine ~1.0 and is falsely rewritten as a drop with
    // keeper == doc_id — breaking both the byte-identical rewrite
    // and the keeper-precedes-doc invariant.
    val vsCorpus = aB.join(idx, Seq("cell"))
      .where(col("pid") =!= col("id"))
    val vsEarlier = aB.join(
      aB.select(col("id").as("pid"), col("vec").as("pvec"),
        col("cell")), Seq("cell"))
      .where(col("pid") < col("id"))
    val drops = vsCorpus.unionByName(vsEarlier)
      .select(col("cell"), col("id"), col("pid"),
        VectorDistance.cosine(col("vec"), col("pvec")).as("s"))
      .where(col("s") >= tau)
      .groupBy(col("id").as("doc_id"), col("cell"))
      .agg(max(struct(col("s").as("s"), (-col("pid")).as("nid"))).as("m"))
      .select(col("doc_id"), col("cell"), (-col("m.nid")).as("keeper"),
        round(col("m.s"), 4).as("cosine"))
      .localCheckpoint(true)
    drops.write.mode("overwrite").parquet(s"$dropDir/batch=$batchId")
    val survivors = aB
      .join(drops.select(col("doc_id").as("id")), Seq("id"), "left_anti")
      .select("id", "vec")
    if (!survivors.isEmpty) Ann.ivfIndexUpsert(s, indexPath, survivors)
  }

  /** Attach the maintenance loop to an embedding-arrival stream over
    * an existing index at `indexPath`.
    */
  def attach(arrivals: DataFrame, indexPath: String, dropDir: String,
             checkpoint: String, tau: Double = 0.35): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(fold(indexPath, dropDir, tau) _)
      .start()
}
