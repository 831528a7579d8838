package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Train/eval DECONTAMINATION — the curation step that keeps
  * benchmark answers out of training data: find every (train doc,
  * eval doc) pair whose shared-shingle fraction crosses a threshold,
  * so contaminated training docs can be quarantined before a model
  * ever sees them. The published pipelines run exactly this shape
  * (n-gram overlap of each training document against the eval sets).
  *
  * Plan: one shingle pass per side (reusing [[Dedup.shingleRows]]'s
  * codegen posexplode+lead formulation), then a shingle-value
  * equi-join — blocked by content, so bucket cardinality GROWS with
  * the corpus (the §4 rule) — and a per-pair count against the eval
  * doc's shingle cardinality. Work is proportional to SHARED content,
  * not |train| × |eval|: disjoint docs never meet.
  *
  * At web scale the same plan runs with longer shingles (13-grams in
  * the published decontamination setups — rarer, so buckets shrink)
  * and a document-frequency cap dropping stop-grams before the join
  * (the classic hot-key guard; AQE skew-split handles the residue).
  * Overlap here is measured against the EVAL side's cardinality —
  * asymmetric by design: a tiny eval doc fully contained in a large
  * training doc is 100% contaminated, whatever the training doc's
  * size.
  */
object Decontam {

  /** (eval_id, train_id, n_shared, overlap ≥ minOverlap) — split
    * assigned by the deterministic md5 bucket ([[Sampling.split]]),
    * "eval" = everything outside the train fraction.
    */
  def contamination(corpus: DataFrame, trainFrac: Double = 0.8,
                    minOverlap: Double = 0.2): DataFrame = {
    val withSplit = Sampling.split(corpus, "doc_id", trainFrac, 0.0)
    val train = withSplit.where(col("split") === "train")
      .select("doc_id", "text")
    val eval_ = withSplit.where(col("split") =!= "train")
      .select("doc_id", "text")
    val ts = Dedup.shingleRows(train)
      .select(col("doc_id").as("train_id"), col("s"))
    // per-eval-doc cardinality rides the shingle rows via a window
    // instead of a separate groupBy branch — a second reference to
    // the eval-shingle frame would re-run its whole scan+distinct
    // lineage; the window costs one eval_id exchange of the SMALL
    // (eval) side only. `max(ec)` in the pair aggregate just carries
    // the per-eval constant through.
    val es = Dedup.shingleRows(eval_)
      .select(col("doc_id").as("eval_id"), col("s"))
      .withColumn("ec", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("eval_id")))
    ts.join(es, "s")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n"), max("ec").as("ec"))
      .where(col("n") / col("ec") >= minOverlap)
      .select(col("eval_id"), col("train_id"), col("n").as("n_shared"),
        round(col("n") / col("ec"), 4).as("overlap"))
      .orderBy("eval_id", "train_id")
  }

  /** Surface query on the planted-duplicate corpus: the +100000
    * duplicates whose hash lands them across the split boundary are
    * guaranteed contamination; word-salad 3-gram sharing supplies
    * background near-misses the threshold must reject.
    */
  def contaminationQuery(s: SparkSession, dir: String): DataFrame =
    contamination(Dedup.corpusWithExactDups(s, dir))

  /** SEMANTIC decontamination — the embedding-space complement of the
    * shingle scan: paraphrased or reworded benchmark items share no
    * 3-grams with their training copy, but their embeddings sit at
    * high cosine. Flag each eval item's most-similar train item above
    * a cosine bar (the published pipelines run exactly this pass
    * beside n-gram overlap).
    *
    * Scale shape: the eval side can be a large fraction of the corpus
    * — NOT broadcastable — so candidates come from cross-split
    * sign-LSH bucket mates (an equi-join on (table, sig), the
    * [[Dedup.embeddingCosinePairs]] blocking; bucket count grows with
    * `bits`, never an eval × train expansion), exact cosine verifies,
    * and the per-eval argmax is a max_by aggregate over candidate
    * rows (candidate-sized, no window over either split). The argmax
    * orders by (cosine, −train_id), so ties break on the lowest
    * train id deterministically on both engines.
    */
  def semantic(s: SparkSession, dir: String, minCos: Double = 0.35,
               trainFrac: Double = 0.8): DataFrame = {
    val e = graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val sp = Sampling.split(e, "vec_id", trainFrac, 0.0)
    def sigs(side: DataFrame) =
      Ann.lshSignatures(side, "embedding", "vec_id")
    val ts = sigs(sp.where(col("split") === "train"))
    val es = sigs(sp.where(col("split") =!= "train"))
    val cand = es.as("q").join(ts.as("t"), Seq("table", "sig"))
      .select(col("q.id").as("eval_id"), col("t.id").as("train_id"))
      .distinct()
    cand
      .join(e.as("x"), col("eval_id") === col("x.vec_id"))
      .join(e.as("y"), col("train_id") === col("y.vec_id"))
      .select(col("eval_id"), col("train_id"),
        graft.functions.VectorDistance
          .cosine(col("x.embedding"), col("y.embedding")).as("c"))
      .where(col("c") >= minCos)
      .groupBy("eval_id")
      .agg(max_by(struct(col("c"), col("train_id")),
        struct(col("c"), (-col("train_id")).as("nt"))).as("w"))
      .select(col("eval_id"), col("w.train_id").as("train_id"),
        round(col("w.c"), 4).as("cosine"))
      .orderBy("eval_id")
  }
}
