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

  /** The second capstone: the train/eval CARVE-OUT — the last step of
    * a training-data pipeline, composed only from the engine's own
    * operators. The CLEANED corpus (the same quality gate + cluster
    * dedup as [[cleanCorpus]]) deals into md5 train/val/test splits
    * ([[Sampling.split]] — layout-invariant, audit-stable), and the
    * report carries a decontamination column: how many val/test docs
    * still share ≥ 20% of their shingles with some train doc (the
    * [[Decontam.contamination]] formulation over the cleaned corpus —
    * near-dup removal catches most cross-split leaks, but docs below
    * the dedup bar can still sit above the contamination bar; this
    * column is the audit of exactly that gap).
    *
    * Plan notes: the clustering stage is reused through its
    * checkpointed fixpoint; the cleaned+split frame is re-derived per
    * consumer — quality and the split decision are narrow scan-side
    * projections (recompute-over-persist, SURVEY §4), while the
    * shingle joins are the same content-blocked equi-joins the
    * standalone decontam query runs.
    */
  def trainEvalSplit(s: SparkSession, dir: String,
                     minQuality: Double = 0.5,
                     minJaccard: Double = 0.5,
                     minOverlap: Double = 0.2): DataFrame = {
    val quality = TextOps.qualityMetrics(s, dir)
      .select(col("doc_id"), col("quality_score"))
    val victims = Dedup.nearDupClustersUnsorted(s, dir, minJaccard)
      .where(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val cleaned = Tables.documents(s, dir).select("doc_id", "text")
      .join(quality, "doc_id")
      .where(col("quality_score") >= minQuality)
      .join(victims, Seq("doc_id"), "left_anti")
      .select("doc_id", "text")
    val withSplit = Sampling.split(cleaned, "doc_id", 0.8, 0.1)
    val trainS = Dedup.shingleRows(
        withSplit.where(col("split") === "train")
          .select("doc_id", "text"))
      .select(col("doc_id").as("train_id"), col("s"))
    val evalS = Dedup.shingleRows(
        withSplit.where(col("split") =!= "train")
          .select("doc_id", "text"))
      .select(col("doc_id").as("eval_id"), col("s"))
    val ecard = evalS.groupBy("eval_id").agg(count(lit(1)).as("ec"))
    val contaminated = trainS.join(evalS, "s")
      .groupBy("train_id", "eval_id").agg(count(lit(1)).as("n"))
      .join(ecard, "eval_id")
      .where(col("n") / col("ec") >= minOverlap)
      .select(col("eval_id").as("doc_id")).distinct()
    val contamBySplit = withSplit.join(contaminated, "doc_id")
      .groupBy("split").agg(count(lit(1)).as("n_contaminated"))
    withSplit.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .join(contamBySplit, Seq("split"), "left_outer")
      .select(col("split"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .orderBy("split")
  }
}
