package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The capstone composition: a training-data cleaning pipeline built
  * ONLY from the engine's own operators — quality scoring
  * ([[TextOps.quality]]), near-dup removal (the [[Dedup.minhashPairs]]
  * LSH pipeline; the higher doc_id of each verified pair is dropped),
  * and per-source reporting. One declarative plan end to end: Catalyst
  * sees through the composition, so the quality projection, the dedup
  * candidate join, and the anti join all share scans and pushdowns
  * exactly as if hand-fused — the property that makes an operator
  * LIBRARY (not a script collection) the right shape at 100 TB.
  */
object Pipeline {

  /** Surviving-corpus stats per source after quality gating and
    * near-dup removal.
    */
  def cleanCorpus(s: SparkSession, dir: String,
                  minQuality: Double = 0.5,
                  minJaccard: Double = 0.5): DataFrame = {
    val docs = Tables.documents(s, dir)
    // unsorted internal forms: the surface orderBys of the standalone
    // queries would be executed here and then destroyed by the join/
    // distinct exchanges
    val quality = TextOps.qualityMetrics(s, dir)
      .select(col("doc_id"), col("quality_score"))
    // near-dup victims: everything but each CLUSTER's minimum doc —
    // dropping only the larger doc of each direct pair (round 2's
    // form) keeps transitive duplicates: for pairs (1,3),(2,3), docs
    // 1 and 2 never meet in a pair yet duplicate each other via 3
    val victims = Dedup.connectedComponents(
        Dedup.minhashPairsUnsorted(s, dir, minJaccard).select("id1", "id2"))
      .where(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    docs.select("doc_id", "source")
      .join(quality, "doc_id")
      .where(col("quality_score") >= minQuality)
      .join(victims, Seq("doc_id"), "left_anti")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("quality_score"), 4).as("avg_quality"))
      .orderBy("source")
  }
}
