package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for training-data pipelines:
  * downsampling dominant strata (languages, sources) and carving
  * train/val/test splits.
  *
  * The sampling decision is a PURE FUNCTION of the row's id — the
  * first 16 bits of md5(id) as a uniform bucket in [0, 65536) — not
  * an RNG: re-running the pipeline, adding executors, or reordering
  * partitions cannot change which rows are kept (Spark's
  * `sample()`/`sampleBy()` are seeded per-partition, so a repartition
  * RESAMPLES — unacceptable when the sample defines a training set
  * that must be reproducible and auditable). A row's fate is also
  * stable under corpus growth: new rows get new hashes, old rows keep
  * their decision — the property that makes incremental re-runs emit
  * consistent splits.
  *
  * Plan shape: one projection + filter over the scan, no shuffle, no
  * UDF (md5/substring are codegen built-ins) — embarrassingly
  * parallel at any scale. The bucket compares against the threshold
  * as a 4-hex-digit STRING (fixed-width lowercase hex compares
  * lexicographically ≡ numerically), which any engine with md5()
  * reproduces bit-for-bit — the DuckDB oracles mirror it verbatim.
  */
object Sampling {

  /** Uniform [0, 65536) bucket as 4 lowercase hex digits. */
  def hashBucket(id: Column): Column =
    substring(md5(id.cast("string").cast("binary")), 1, 4)

  private def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    val n = math.round(rate * 65536)
    // rate 1.0 must keep every bucket, but 0x10000 as the string
    // "10000" sorts BELOW "2000" lexicographically (first-char
    // compare) — use "g", which sorts above every hex digit, as the
    // above-all fencepost instead
    if (n >= 65536L) "g" else f"$n%04x"
  }

  /** Keep each row with probability `rates(stratum)` (default rate
    * for strata not in the map), deterministically by id hash.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val thresholds = rates.map { case (k, r) => k -> hexThreshold(r) }
    val thr = coalesce(
      element_at(typedlit(thresholds), col(stratumCol)),
      lit(hexThreshold(defaultRate)))
    df.where(hashBucket(col(idCol)) < thr)
  }

  /** Assign every row to train/val/test by id-hash range —
    * non-overlapping, exhaustive, reproducible. Fractions are
    * cumulative hex fenceposts: [0, train) train, [train, train+val)
    * val, rest test.
    */
  def split(df: DataFrame, idCol: String,
            trainFrac: Double, valFrac: Double): DataFrame = {
    require(trainFrac + valFrac <= 1.0, "train+val exceed 1.0")
    val b = hashBucket(col(idCol))
    df.withColumn("split",
      when(b < lit(hexThreshold(trainFrac)), "train")
        .when(b < lit(hexThreshold(trainFrac + valFrac)), "val")
        .otherwise("test"))
  }

  /** 60-bit id hash as a uniform double in [0, 1) — exact IEEE
    * division by 2^60, reproducible in any engine with md5().
    */
  private def u01(id: Column): Column =
    graft.functions.Md5Prefix60(id.cast("string")).cast("double") /
      lit(1152921504606846976L).cast("double")

  /** Poisson (probability-proportional-to-size) sampling: include row
    * i with probability min(1, budget·wᵢ/W), deciding by the id hash
    * — the weighted counterpart of [[stratifiedSample]] for corpus
    * curation (e.g. upweighting long documents). E[|sample|] ≈ budget.
    *
    * Chosen over the top-n exponential-keys scheme (Efraimidis–
    * Spirakis u^(1/w)) deliberately: that needs ln/pow, whose last-ulp
    * rounding is libm-implementation-defined — this uses only +,·,/
    * (IEEE correctly-rounded everywhere), so the decision, like all
    * sampling here, is bit-reproducible across engines and the DuckDB
    * oracle can replay it exactly. Same scale shape as split(): pure
    * scan-side filter, no shuffle, layout-invariant.
    *
    * `totalWeight` is an exact integer sum (order-independent —
    * a double sum would be partition-order-dependent), computed once
    * by the caller.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     budget: Double, totalWeight: Long): DataFrame = {
    val p = least(lit(1.0),
      (lit(budget) * col(weightCol).cast("double"))
        / lit(totalWeight.toDouble))
    df.withColumn("p", round(p, 6)).where(u01(col(idCol)) < p)
  }

  /** Surface query: sample ~150 documents proportional to length. */
  def weightedSampleQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val w = docs.agg(sum(col("n_chars").cast("long"))).collect()(0).getLong(0)
    weightedSample(docs, "doc_id", "n_chars", budget = 150.0,
      totalWeight = w).orderBy("doc_id")
  }

  /** Surface query: downsample English (the dominant stratum) to 25%
    * and the rest to 75%, then stamp the survivors with a 80/10/10
    * train/val/test split — the two ops compose into ONE scan +
    * filter + projection.
    */
  /** HASH-UNIFORMITY AUDIT — the hygiene check behind every md5
    * decision this library makes (splits, reservoirs, LSH bands,
    * bucket-partitioned indexes): documents bucketed by
    * Md5Prefix60 % 64, one chi-square against uniform plus the
    * min/max bucket shares. A skewed hash would silently bias every
    * sample and unbalance every bucketed index partition — this is
    * the query that would catch it. Chi² = Σ(o−e)²/e with e = n/64
    * closes over exact integer counts (the numerator rides the
    * ×64-scaled integer form Σ(64·o − n)² / (64·n) so no per-bucket
    * float division order matters); one scan, one 64-key aggregate.
    */
  def hashUniformityAudit(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = graft.Tables.documents(s, dir)
      .select(pmod(graft.functions.Md5Prefix60(
        col("doc_id").cast("string")), lit(64L)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("o"))
    // empty buckets count toward the statistic (the zero-anchor
    // rule): a hash dumping everything in few buckets must score
    // catastrophic, not absent
    val b = s.range(64).toDF("bucket")
      .join(counts, Seq("bucket"), "left")
      .select(coalesce(col("o"), lit(0L)).as("o"))
      .localCheckpoint(true) // n + chi-square both read it
    val n = b.agg(sum("o").as("n"))
    val dev = (col("o") * 64 - col("n")).cast(dec)
    b.crossJoin(broadcast(n))
      .select(col("o"), col("n"), (dev * dev).as("sq"))
      .groupBy("n")
      .agg(count(lit(1)).as("n_buckets"), min("o").as("min_bucket"),
        max("o").as("max_bucket"), sum("sq").as("ssq"))
      .select(col("n").as("n_docs"), col("n_buckets"),
        col("min_bucket"), col("max_bucket"),
        round(col("ssq").cast("double")
          / (col("n") * 64).cast("double"), 4).as("chi2"))
  }

  def sampleSplitQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "lang", "source")
    val sampled = stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.25), defaultRate = 0.75)
    split(sampled, "doc_id", trainFrac = 0.8, valFrac = 0.1)
      .select(col("doc_id"), col("lang"), col("source"), col("split"))
      .orderBy("doc_id")
  }

  /** DETERMINISTIC RESERVOIR — exactly k docs per stratum, uniform
    * over the stratum, as the k smallest md5 hashes (bottom-k
    * sketch): the replayable form of reservoir sampling (a true
    * reservoir's keep-set depends on arrival order; the k-smallest-
    * hash set is a pure function of the ids, so it survives
    * repartition, retry, and engine swap — and the SAME k docs come
    * back when the query reruns, which is what an eval-set carve-out
    * needs).
    *
    * Scale shape: the [[graft.operators.TopKAgg]] heap per stratum —
    * ≤ k (key, id) pairs per partition per group shuffle (map-side
    * partial), where the rank-window formulation shuffles and sorts
    * the whole stratum through one partition. The hash is reduced
    * mod 2^50 before the heap's double key so the key is EXACT in a
    * double (2^50 < 2^53; a raw 60-bit hash could collapse two ids
    * onto one double and let engines disagree on the boundary dock);
    * ties break on doc_id in both engines.
    */
  def reservoirQuery(s: SparkSession, dir: String, k: Int = 25): DataFrame = {
    val h50 = graft.functions.Md5Prefix60(col("doc_id").cast("string")) %
      lit(1125899906842624L) // 2^50
    val agg = TopKAgg.topK(k)
    Tables.documents(s, dir)
      .select(col("lang"), h50.cast("double").as("key"),
        col("doc_id").as("id"))
      .groupBy("lang")
      .agg(agg(col("key"), col("id")).as("top"))
      .select(col("lang"), posexplode(col("top.items")).as(Seq("pos", "c")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
        col("c.id").as("doc_id"), col("c.key").cast("long").as("h50"))
      .orderBy("lang", "rk")
  }

  /** RANDOM-SAMPLING API (r13 — Qdrant's query API `"sample":
    * "random"`: a uniform draw from the FILTERED collection, for
    * exploration and drift checks — no similarity ranking involved):
    * the deterministic bottom-k-hash form of [[reservoirQuery]], but
    * collection-level (one global heap, no strata) and SEEDED — the
    * seed participates in the hash input, so distinct calls draw
    * distinct yet individually replayable samples (a true RNG sample
    * would change under retry/repartition; this one is a pure
    * function of (seed, id)). The filter composes BEFORE the heap
    * and pushes to the scan; map-side partial heaps mean ≤ n
    * (key, id) pairs leave each partition however big the corpus.
    */
  def randomSample(df: DataFrame, idCol: String, n: Int,
                   seed: String): DataFrame = {
    val h50 = graft.functions.Md5Prefix60(
      concat(lit(seed + "|"), col(idCol).cast("string"))) %
      lit(1125899906842624L) // 2^50
    val agg = TopKAgg.topK(n)
    df.select(h50.cast("double").as("key"), col(idCol).as("id"))
      .agg(agg(col("key"), col("id")).as("top"))
      .select(posexplode(col("top.items")).as(Seq("pos", "c")))
      .select((col("pos") + 1).cast("long").as("rk"),
        col("c.id").as("id"), col("c.key").cast("long").as("h50"))
      .orderBy("rk")
  }

  /** EXPORT SHARDING — the last step of a training-data pipeline:
    * assign every document a shard id so each output shard carries
    * ~`budget` tokens, in a deterministic md5-dealt order (training
    * wants shuffled, replayable shards; file-arrival order is
    * neither). The assignment needs each doc's GLOBAL token offset —
    * a prefix sum, which at 100 TB cannot be one window over a total
    * order (that is a single-partition sort of the corpus).
    *
    * Distributed prefix-sum decomposition (the classic two-level
    * scan): deal docs into `buckets` md5 buckets; the within-bucket
    * running sum is a bucket-partitioned window (parallel, corpus/B
    * rows per partition); per-bucket totals — B longs — collect to
    * the driver, prefix-sum there, and broadcast back as each
    * bucket's base offset. Global offset = bucket base + within-sum.
    * `buckets` scales with the cluster (B=64 here; thousands at
    * 100 TB) — the bucket count bounds per-partition sort size, not
    * correctness. All-integer arithmetic end to end: offsets and
    * shard ids replay bit-for-bit on any engine, layout or cluster.
    *
    * @return (doc_id, n_tok, start_tok, shard) — shard = the doc's
    *         start-token floor-div budget, so a doc straddling a
    *         boundary belongs to the shard its first token lands in
    */
  def exportShards(docs: DataFrame, idCol: String, nTokCol: String,
                   budget: Long, buckets: Int = 64): DataFrame = {
    val t = docs.select(col(idCol), col(nTokCol).cast("long").as("n_tok"),
      graft.functions.Md5Prefix60(col(idCol).cast("string")).as("h"))
      .withColumn("bk", pmod(col("h"), lit(buckets.toLong)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bk").orderBy(col("h"), col(idCol))
    val within = t.withColumn("cum_in", sum(col("n_tok")).over(w))
    // B totals → driver prefix-sum → broadcast base-offset table
    val totals = within.groupBy("bk").agg(sum("n_tok").as("btot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val bases = totals.toSeq.map { case (bk, tot) =>
      val base = (bk, acc); acc += tot; base
    }
    val s = docs.sparkSession
    import s.implicits._
    val baseDf = broadcast(bases.toDF("bk", "base"))
    within.join(baseDf, "bk")
      .select(col(idCol), col("n_tok"),
        (col("base") + col("cum_in") - col("n_tok")).as("start_tok"))
      .withColumn("shard", expr(s"start_tok div ${budget}L"))
      .orderBy("start_tok", idCol)
  }

  /** EXPORT SHARD MANIFEST — the integrity sidecar a training-data
    * export ships beside its shards (what a loader checks before
    * trusting a resumed download): per shard, doc/token counts, id
    * bounds, and an order-sensitive fingerprint — md5 over the
    * shard's doc_ids in EXPORT order ('|'-joined) — so a re-export
    * that reshuffles or drops a row changes the manifest visibly.
    * Per-shard member lists are budget-bounded (≤ budget docs at ≥1
    * token each), so the collect_list is capacity-sized, never
    * corpus-sized; one aggregate over the shared shard assignment.
    */
  def exportShardManifest(s: SparkSession, dir: String): DataFrame =
    exportShardsQuery(s, dir)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
        expr("md5(concat_ws('|', transform(array_sort(" +
          "collect_list(struct(start_tok, doc_id))), " +
          "x -> CAST(x.doc_id AS STRING))))").as("fingerprint"))
      .orderBy("shard")

  /** Surface query: 2000-token export shards over the corpus. */
  def exportShardsQuery(s: SparkSession, dir: String): DataFrame =
    exportShards(Tables.documents(s, dir)
      .select(col("doc_id"),
        size(org.apache.spark.sql.functions.split(col("text"), " "))
          .as("n_tok")),
      "doc_id", "n_tok", budget = 2000L)

  /** DSIR IMPORTANCE RESAMPLING (Data Selection with Importance
    * Resampling, Xie et al. NeurIPS'23) — the published recipe for
    * picking, out of a raw web-scale pool, the documents whose token
    * distribution most resembles a TARGET domain: hash every token
    * into B buckets, fit add-1-smoothed bucket distributions p
    * (target) and q (raw pool), and weight each raw document by
    * log w = Σ_tokens [ln p_b − ln q_b]. Here the target is the
    * corpus's English slice and the pool everything else — swapping
    * in a quality subset or a domain corpus only changes the two
    * filters.
    *
    * Determinism: buckets are md5-derived (first 16 hash bits mod B,
    * the [[hashBucket]] idiom on token text), the per-bucket score
    * ln((cp+1)(tq+B)) − ln((cq+1)(tp+B)) evaluates from exact
    * integer counts and micro-quantizes to a BIGINT (the zipfFit log
    * discipline), so every document weight is an EXACT integer sum
    * — ranking and the top-K cut are bit-stable on any engine.
    *
    * Scale: one exploded-token pass; both distributions are B-row
    * aggregates (B = 64 — metadata-sized however large the corpus)
    * broadcast back; the per-doc weight rides the same doc_id
    * exchange the tokenize already keys; the final cut is a bounded
    * TakeOrdered, never a corpus sort. The model (B scores) would
    * persist as a byproduct in a production run — a re-score of a
    * new pool batch is then one scan + one broadcast join.
    */
  /** Token → bucket rows for the DSIR model (docs: doc_id, lang,
    * text). Works unchanged on a stream (stateless projection).
    */
  def dsirTokenBuckets(docs: DataFrame, buckets: Int = 64): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        explode(org.apache.spark.sql.functions.split(col("text"), " "))
          .as("tok"))
      .withColumn("b",
        expr("CAST(conv(substring(md5(cast(tok AS binary)), 1, 4), " +
          s"16, 10) AS BIGINT) % $buckets"))

  /** The model STATE — per-bucket target/pool counts. Both sums are
    * ADDITIVE, so this is the streamable half (micro-batches fold by
    * addition, ≤ B rows of state-store buffer forever — the sketch
    * family's state/finalize split applied to a trained model).
    */
  def dsirBucketCounts(toks: DataFrame): DataFrame =
    toks.groupBy("b")
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cp"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("cq"))

  /** Finalize per-bucket importance scores (exact BIGINT micro-nats)
    * from a (b, cp, cq) state table — B-row work however large the
    * corpus that fed the counts.
    */
  def dsirScores(s: SparkSession, counts: DataFrame,
                 buckets: Int = 64): DataFrame = {
    import s.implicits._
    // checkpoint the B-row model: `tots` and the score projection
    // both consume it, and left lazy each would re-run the corpus
    // aggregate behind it (the ScanAudit ≥3-scan rule)
    val model = (0L until buckets.toLong).toDF("b")
      .join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cq"), lit(0L)).as("cq"))
      .localCheckpoint(true)
    val tots = model.agg(sum("cp").as("tp"), sum("cq").as("tq"))
    model.crossJoin(broadcast(tots))
      .select(col("b"),
        expr(s"CAST(round((ln((cp + 1) * (tq + $buckets)) - " +
          s"ln((cq + 1) * (tp + $buckets))) * 1000000) AS BIGINT)")
          .as("sb"))
  }

  def dsirSelect(s: SparkSession, dir: String, buckets: Int = 64,
                 topK: Int = 50): DataFrame = {
    val toks = dsirTokenBuckets(Tables.documents(s, dir), buckets)
    val scores = dsirScores(s, dsirBucketCounts(toks), buckets)
    toks.where(col("lang") =!= "en")
      .join(broadcast(scores), "b")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"), sum("sb").as("lw"))
      .orderBy(col("lw").desc, col("doc_id")).limit(topK)
      // Final 4dp in EXACT integer arithmetic (r14, fuzz seeds
      // 1313/1414): lw is integer micro-nats, so lw/10⁶ can land on
      // a decimal .XXXX5 boundary where Spark's shortest-decimal
      // HALF_UP and DuckDB's binary-double round split (the r13
      // seed-505 class). Half-AWAY-FROM-ZERO of lw/100 as pure
      // integer ops (sign split keeps both engines' integer
      // division semantics identical), then one exact /10⁴.
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (expr("CASE WHEN lw >= 0 THEN (lw + 50) div 100 " +
          "ELSE -((-lw + 50) div 100) END").cast("double") / 10000.0)
          .as("log_weight"))
  }
}
