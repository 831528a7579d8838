package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The capstone composition: a training-data cleaning pipeline built
  * ONLY from the engine's own operators — quality scoring
  * ([[TextOps.qualityMetrics]]), near-dup removal (minhash-LSH pairs
  * → connected components; every doc that is not its CLUSTER's
  * minimum is dropped, so transitive duplicates go too), and
  * per-source reporting. The quality branch, the anti join, and the
  * report remain one declarative plan; the clustering stage is the
  * single iterative island (label propagation runs its rounds
  * eagerly, like the centroid collect in IVF), feeding the plan a
  * checkpointed victims table.
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
    val victims = Dedup.nearDupClustersUnsorted(s, dir, minJaccard)
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
