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

  /** Scan-side projection twin of [[TextOps.qualityMetrics]]'s
    * `quality_score`: the stoplist and the score formula are the ONE
    * shared definition ([[TextOps.stopWords]] /
    * [[TextOps.qualityScore]]), so the gate cannot drift from the
    * metrics query. Stopword occurrences count via
    * Σ_w (|toks| − |array_remove(toks, w)|) — codegen'd collection
    * ops, not the interpreted HOF `filter` lambda the repo's
    * documented pitfall warns about (the sum of exact small-int terms
    * equals the single filter count bit-for-bit). The capstones gate
    * on the score alone, so they can afford the projection form: no
    * shuffle, no join, and a consumer that re-derives the cleaned
    * frame repeats only a cheap map over the scan — which is what
    * makes recompute-over-persist (SURVEY §4) actually hold for them
    * at 100 TB.
    */
  private def withQualityScore(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nToks = size(toks).cast("double")
    val hits = TextOps.stopWords("en")
      .map(w => (size(toks) - size(array_remove(toks, w))).cast("double"))
      .reduce(_ + _)
    val rep = lit(1.0) - size(array_distinct(toks)).cast("double") / nToks
    docs.withColumn("quality_score",
      TextOps.qualityScore(size(toks), hits / nToks, rep))
  }

  /** Surviving-corpus stats per source after quality gating and
    * near-dup removal.
    */
  def cleanCorpus(s: SparkSession, dir: String,
                  minQuality: Double = 0.5,
                  minJaccard: Double = 0.5): DataFrame = {
    val docs = Tables.documents(s, dir)
    // near-dup victims: everything but each CLUSTER's minimum doc —
    // dropping only the larger doc of each direct pair (round 2's
    // form) keeps transitive duplicates: for pairs (1,3),(2,3), docs
    // 1 and 2 never meet in a pair yet duplicate each other via 3.
    // The fixpoint itself is memoized (Dedup.clusterCache), so the
    // unsorted internal form here shares it with the other consumers
    val victims = Dedup.nearDupClustersUnsorted(s, dir, minJaccard)
      .where(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    withQualityScore(docs.select(col("doc_id"), col("source"), col("text")))
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
    * Plan notes: the clustering stage is shared through the memoized
    * checkpointed fixpoint (Dedup.clusterCache); the split decision is
    * evaluated ONCE into a narrow checkpointed assignment
    * (doc_id, split, n_toks — r16: the four consumers used to
    * re-derive quality + anti-join each, and the quality expression
    * costs one array pass per stop word per doc), with the shingle
    * consumers re-attaching text via doc_id semi-joins; the shingle
    * joins are the same content-blocked equi-joins the standalone
    * decontam query runs, and the train/eval shingle scans cover
    * DISJOINT doc sets (each doc is tokenized exactly once across the
    * pair of them).
    */
  def trainEvalSplit(s: SparkSession, dir: String,
                     minQuality: Double = 0.5,
                     minJaccard: Double = 0.5,
                     minOverlap: Double = 0.2): DataFrame = {
    val victims = Dedup.nearDupClustersUnsorted(s, dir, minJaccard)
      .where(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val cleaned = withQualityScore(
        Tables.documents(s, dir).select("doc_id", "text"))
      .where(col("quality_score") >= minQuality)
      .join(victims, Seq("doc_id"), "left_anti")
      .select("doc_id", "text")
    val withSplit = Sampling.split(cleaned, "doc_id", 0.8, 0.1)
    // NARROW SPLIT-ASSIGNMENT CHECKPOINT (r16): withSplit was
    // referenced FOUR times (train shingles, eval shingles, the
    // contamination rollup, the final per-split aggregate), and every
    // reference re-evaluated the whole upstream lineage — the quality
    // expression (one array pass per stop word per doc) plus the
    // near-dup-victim anti-join. The checkpoint carries only
    // (doc_id, split, n_toks) — never text — so it stays
    // cluster-table-narrow at any corpus size; the two shingle
    // consumers re-attach text by a doc_id semi-join against the
    // source table (doc_id is unique in documents), which is one
    // id-keyed join instead of a full quality re-evaluation.
    val splitMeta = withSplit.select(col("doc_id"), col("split"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .localCheckpoint(true)
    val docsIdText = Tables.documents(s, dir).select("doc_id", "text")
    val trainS = Dedup.shingleRows(
        docsIdText.join(splitMeta.where(col("split") === "train")
          .select("doc_id"), Seq("doc_id"), "left_semi"))
      .select(col("doc_id").as("train_id"), col("s"))
    // eval-shingle cardinality via a window on the small side — one
    // evaluation of the eval lineage instead of two (see
    // Decontam.contamination for the rationale)
    val evalS = Dedup.shingleRows(
        docsIdText.join(splitMeta.where(col("split") =!= "train")
          .select("doc_id"), Seq("doc_id"), "left_semi"))
      .select(col("doc_id").as("eval_id"), col("s"))
      .withColumn("ec", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("eval_id")))
    val contaminated = trainS.join(evalS, "s")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n"), max("ec").as("ec"))
      .where(col("n") / col("ec") >= minOverlap)
      .select(col("eval_id").as("doc_id")).distinct()
    val contamBySplit = splitMeta.join(contaminated, "doc_id")
      .groupBy("split").agg(count(lit(1)).as("n_contaminated"))
    splitMeta.groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
      .join(contamBySplit, Seq("split"), "left_outer")
      .select(col("split"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .orderBy("split")
  }

  /** DATASET CARD — the one-row corpus summary a released dataset
    * ships (Gebru et al.'s datasheets, as numbers): size (docs,
    * tokens, languages, sources), EXACT duplicate share (distinct
    * texts vs docs), verified near-dup pair count (the minhash
    * chain), and both quality gates' keep rates off the shared tf
    * aggregate ([[graft.operators.TextOps.qualityKappa]]'s gates —
    * the card and the agreement audit read the same counts). Third
    * capstone shape: every number is an existing proven plan's
    * 1-row aggregate, crossJoined — the card CANNOT disagree with
    * the reports it summarizes.
    */
  def datasetCard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bs = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
      countDistinct("lang").as("n_langs"),
      countDistinct("source").as("n_sources"),
      countDistinct("text").as("n_distinct_texts"))
    val ndp = Dedup.minhashPairsCached(s, dir, 0.5)
      .agg(count(lit(1)).as("near_dup_pairs"))
    val kq = TextOps.qualityKappa(s, dir)
      .select(round(col("keep_model").cast("double") / col("n_docs"), 4)
          .as("keep_rate_model"),
        round(col("keep_heuristic").cast("double") / col("n_docs"), 4)
          .as("keep_rate_heuristic"))
    bs.crossJoin(ndp).crossJoin(kq)
      .select(col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_sources"),
        round(lit(1.0) - col("n_distinct_texts").cast("double")
          / col("n_docs"), 4).as("exact_dup_share"),
        col("near_dup_pairs"), col("keep_rate_model"),
        col("keep_rate_heuristic"))
  }
}
