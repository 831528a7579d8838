package graft.operators

import graft.Tables
import graft.functions.Md5Prefix60
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the 100 TB
  * distinct-count operator. `count(distinct x)` shuffles every
  * distinct value; the KMV aggregator's state is the k smallest
  * distinct 60-bit hashes (a bounded sorted set), combined map-side,
  * so the exchange carries at most k longs per partition per group —
  * the same partial-aggregation shape as TopKAgg, applied to
  * cardinality estimation.
  *
  * Estimator (Bar-Yossef et al., "Counting distinct elements in a
  * data stream"): with U_(k) the k-th smallest of n distinct uniform
  * hashes in [0, 1), E[U_(k)] = k/(n+1), so n̂ = (k-1)/U_(k) is the
  * standard unbiased KMV estimate; below k distinct values the set
  * holds everything and the count is exact. Hashes are md5-derived
  * (Md5Prefix60), so the whole pipeline — including the estimate —
  * is a pure function of the data that a DuckDB mirror reproduces
  * bit-for-bit: this "approximate" operator is oracle-checkable,
  * unlike HLL whose register layout is implementation-defined.
  */
case class KmvSummary(n_seen: Long, kth: Long, mins: Seq[Long])

class KmvAgg(k: Int)
    extends Aggregator[Long, java.util.TreeSet[java.lang.Long], KmvSummary] {

  override def zero: java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  // TreeSet add dedups repeated values for free — no pre-distinct
  // (and no extra shuffle) is ever needed in front of this aggregate
  override def reduce(b: java.util.TreeSet[java.lang.Long],
                      h: Long): java.util.TreeSet[java.lang.Long] = {
    b.add(h)
    if (b.size > k) b.pollLast()
    b
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.pollLast()
    }
    b1
  }

  /** kth = the k-th smallest hash (the set's max once full); -1
    * sentinel while the set is still exact. `mins` is the retained
    * set itself (≤ k longs) — what makes the summary MERGEABLE
    * downstream: the global k smallest distinct hashes are contained
    * in the union of per-group k-min sets, so a rollup never needs
    * the raw data again (see Sketch.kmvRollup).
    */
  override def finish(b: java.util.TreeSet[java.lang.Long]): KmvSummary = {
    import scala.jdk.CollectionConverters._
    KmvSummary(b.size.toLong, if (b.size >= k) b.last() else -1L,
      b.iterator().asScala.map(_.longValue()).toSeq)
  }

  override def bufferEncoder: Encoder[java.util.TreeSet[java.lang.Long]] =
    Encoders.kryo[java.util.TreeSet[java.lang.Long]]
  override def outputEncoder: Encoder[KmvSummary] =
    Encoders.product[KmvSummary]
}

object Sketch {

  /** k = 64 gives ~1/√(k−2) ≈ 13% standard error — the usual
    * cheap-sketch operating point; production tunes k per column.
    */
  val K = 64

  private val twoPow60 = lit(1152921504606846976L).cast("double")

  /** Estimated distinct `valueCol` per `groupCol`: one scan, one
    * bounded-state aggregation. n_seen = min(k, distinct-hash count);
    * est_distinct is exact below k, (k−1)/U_(k) at or above it.
    */
  def kmvDistinct(df: DataFrame, groupCol: String,
                  valueCol: String, k: Int = K): DataFrame = {
    val agg = udaf(new KmvAgg(k), Encoders.scalaLong)
    df.select(col(groupCol),
        graft.functions.Md5Prefix60(col(valueCol).cast("string")).as("h"))
      .groupBy(groupCol)
      .agg(agg(col("h")).as("kmv"))
      .select(col(groupCol), col("kmv.n_seen").as("n_seen"),
        estOf(col("kmv.n_seen"), col("kmv.kth"), k).as("est_distinct"))
      .orderBy(groupCol)
  }

  /** Surface query: estimated distinct users per event type. */
  def kmvQuery(s: SparkSession, dir: String): DataFrame =
    kmvDistinct(Tables.events(s, dir).select("event_type", "user_id"),
      "event_type", "user_id")

  private def estOf(nSeen: org.apache.spark.sql.Column,
                    kth: org.apache.spark.sql.Column, k: Int) =
    round(
      when(nSeen < k, nSeen.cast("double"))
        .otherwise((lit((k - 1).toDouble) * twoPow60) / kth.cast("double")),
      4)

  /** Sketch ROLLUP — the mergeability property productized: the
    * per-group sketches AND a global estimate derived from them
    * alone, never rescanning the data. Correct because the global k
    * smallest distinct hashes are contained in the union of per-group
    * k-min sets (any group with < k distinct retained everything);
    * the union is ≤ groups·k longs — sketch-sized, the shape that
    * makes distinct-count cubes feasible at 100 TB where
    * count(distinct) cannot even rollup (it is not an algebraic
    * aggregate).
    */
  def kmvRollup(df: DataFrame, groupCol: String, valueCol: String,
                k: Int = K): DataFrame = {
    val agg = udaf(new KmvAgg(k), Encoders.scalaLong)
    // two consumers (per-group slice + global rollup) — materialize
    // the groups×k-sized sketch table once instead of re-running the
    // scan+agg per consumer (the kmvSetOps rule)
    val grouped = df.select(col(groupCol),
        graft.functions.Md5Prefix60(col(valueCol).cast("string")).as("h"))
      .groupBy(groupCol)
      .agg(agg(col("h")).as("kmv"))
      .localCheckpoint(true)
    val per = grouped.select(col(groupCol).as("grp"),
      col("kmv.n_seen").as("n_seen"),
      estOf(col("kmv.n_seen"), col("kmv.kth"), k).as("est_distinct"))
    val global = grouped
      .select(explode(col("kmv.mins")).as("h")).distinct()
      .orderBy("h").limit(k)
      .agg(count(lit(1)).as("n_seen"), max(col("h")).as("kth"))
      .select(lit("__all__").as("grp"), col("n_seen"),
        estOf(col("n_seen"), col("kth"), k).as("est_distinct"))
    per.unionByName(global).orderBy("grp")
  }

  /** KMV SET OPERATIONS — the theta-sketch capability on the same
    * summaries: estimated union, intersection, and Jaccard for every
    * PAIR of groups, derived from the per-group k-min sets alone.
    * This answers the audience-overlap question ("how many users do
    * event types A and B share?") that exact computation prices at a
    * distinct-pairs shuffle per pair — here the data is scanned ONCE
    * for the sketches and all pair math runs on ≤ groups²·k longs.
    *
    * Estimators, all pure functions of the retained hash sets:
    *  - union: the k smallest of Sa ∪ Sb ARE the true k smallest of
    *    A ∪ B (each is retained by its own side), so n̂∪ = (k−1)/U(k)
    *    — same estimator as a direct union sketch; exact while
    *    |Sa ∪ Sb| < k (both sides were exact);
    *  - Jaccard: Broder's resemblance estimator
    *    Ĵ = |MinK(Sa ∪ Sb) ∩ Sa ∩ Sb| / min(k, |Sa ∪ Sb|) — the
    *    fraction of the union's k-min that both sets contain;
    *  - intersection: n̂∩ = Ĵ · n̂∪ (inclusion–exclusion on the same
    *    two estimates, the standard KMV composition).
    * md5 hashing keeps every estimate a deterministic function of
    * the data — the DuckDB mirror reproduces even the approximate
    * values bit-for-bit (the sketch-family rule).
    */
  def kmvSetOps(df: DataFrame, groupCol: String, valueCol: String,
                k: Int = K): DataFrame = {
    val agg = udaf(new KmvAgg(k), Encoders.scalaLong)
    // the grouped sketch table feeds BOTH sides of the pair self-join
    // — without materialization each side re-runs the full scan+agg
    // (ScanAudit caught events=2). It is groups×k longs: exactly the
    // "checkpoint the SMALL frame" rule (SURVEY §4)
    val g = df.select(col(groupCol).as("grp"),
        graft.functions.Md5Prefix60(col(valueCol).cast("string")).as("h"))
      .groupBy("grp").agg(agg(col("h")).as("kmv"))
      .select(col("grp"), col("kmv.n_seen").as("ns"),
        col("kmv.kth").as("kth"), col("kmv.mins").as("mins"))
      .localCheckpoint(true)
    val pairs = g.select(col("grp").as("grp_a"), col("ns").as("ns_a"),
        col("kth").as("kth_a"), col("mins").as("mins_a"))
      .crossJoin(g.select(col("grp").as("grp_b"), col("ns").as("ns_b"),
        col("kth").as("kth_b"), col("mins").as("mins_b")))
      .where(col("grp_a") < col("grp_b"))
    val uEst = when(size(col("uni")) < k, size(col("uni")).cast("double"))
      .otherwise(lit((k - 1).toDouble) * twoPow60 /
        element_at(col("uni"), col("m")).cast("double"))
    val jEst = col("jnum").cast("double") / col("m").cast("double")
    pairs
      .withColumn("uni", array_sort(array_union(col("mins_a"), col("mins_b"))))
      .withColumn("m", least(lit(k), size(col("uni"))))
      .withColumn("jnum", size(array_intersect(
        slice(col("uni"), 1, k),
        array_intersect(col("mins_a"), col("mins_b")))))
      .select(col("grp_a"), col("grp_b"),
        estOf(col("ns_a"), col("kth_a"), k).as("est_a"),
        estOf(col("ns_b"), col("kth_b"), k).as("est_b"),
        round(uEst, 4).as("est_union"),
        round(jEst, 4).as("jaccard_est"),
        round(jEst * uEst, 4).as("est_inter"))
      .orderBy("grp_a", "grp_b")
  }

  /** Surface query: overlap of the high-value (value > 200) user
    * audiences between every pair of event types — the qualifying
    * sets genuinely differ per type (the full user sets are all
    * ~identical), and the threshold keeps sf0.01 on the exact path
    * while sf0.1 exercises the estimators.
    */
  def kmvSetOpsQuery(s: SparkSession, dir: String): DataFrame =
    kmvSetOps(Tables.events(s, dir).where(col("value") > 200)
      .select("event_type", "user_id"), "event_type", "user_id")

  def kmvRollupQuery(s: SparkSession, dir: String): DataFrame =
    kmvRollup(Tables.events(s, dir).select("event_type", "user_id"),
      "event_type", "user_id")

  /** Mergeable fixed-bin histogram quantile sketch — the distributed
    * percentile pattern beside KMV's distinct counts: bin the value
    * (integer floor-div), count per (group, bin), estimate percentile
    * p by linear interpolation inside the first bin whose cumulative
    * count reaches rank ceil(p·n). State is ≤ groups × bins longs —
    * the shuffle never carries values, and histograms MERGE by adding
    * bin counts, so per-source summaries roll up to the global
    * estimate without rescanning (exact percentiles need a full sort
    * or the two-pass exact path corpus_stats takes; at 100 TB the
    * single bounded-state pass is the operating point).
    *
    * Determinism: ranks are pure integer arithmetic — ceil(num·n/den)
    * computed as (num·n + den − 1) `div` den, Catalyst's
    * IntegralDivide (the oracle mirrors it with DuckDB's `//`), exact
    * at ANY n — and the only float op is the final interpolation
    * division of two integers, bit-identical on any IEEE engine, so
    * even the estimates are DuckDB-oracled (quantile_approx/t-digest
    * internals are not).
    *
    * @param pcts (label, num, den) percentiles as exact rationals
    */
  def histQuantile(df: DataFrame, groupCol: String, valueCol: String,
                   binWidth: Int = 64,
                   pcts: Seq[(String, Int, Int)] =
                     Seq(("p50_est", 1, 2), ("p95_est", 19, 20))): DataFrame =
    histFinish(histBinCounts(df, groupCol, valueCol, binWidth),
      groupCol, binWidth, pcts)

  /** The sketch STATE: per-(group, bin) counts — a plain streaming-
    * compatible aggregation (this is what a stream maintains in its
    * state store; bins merge by addition, so waves fold exactly like
    * partitions do). The estimate derivation lives in [[histFinish]]
    * because window functions don't run on an unfinished stream —
    * the same state/finalize split the KMV aggregator has built in.
    */
  def histBinCounts(df: DataFrame, groupCol: String, valueCol: String,
                    binWidth: Int = 64): DataFrame =
    // a NULL value has no bin: a NULL-bin row would sort NULLS-FIRST
    // into Spark's cumulative rank and NULLS-LAST into DuckDB's,
    // shifting every percentile (r12 fuzz)
    df.where(col(valueCol).isNotNull)
      .select(col(groupCol),
        floor(col(valueCol).cast("double") / binWidth).cast("long")
          .as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Finish: cumulative ranks + in-bin interpolation over the
    * bin-count state (groups × bins rows — summary-sized).
    */
  def histFinish(binned: DataFrame, groupCol: String, binWidth: Int,
                 pcts: Seq[(String, Int, Int)] =
                   Seq(("p50_est", 1, 2), ("p95_est", 19, 20))): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = binWidth
    val cumWin = Window.partitionBy(groupCol).orderBy("bin")
    val totWin = Window.partitionBy(groupCol)
    val cum = binned
      .withColumn("cum", sum("cnt").over(cumWin))
      .withColumn("n", sum("cnt").over(totWin))
    val ests = pcts.map { case (label, num, den) =>
      // rank t = ceil(num·n/den) via integer division (`div` =
      // IntegralDivide — no double rounding at any n), then
      // interpolate inside the covering bin:
      // bin·w + w·(t − cum_before)/cnt
      val t = expr(s"(${num}L * n + ${den - 1}) div ${den}L")
      val hit = col("cum") >= t
      val est = lit(w.toDouble) * col("bin") +
        lit(w.toDouble) * (t - (col("cum") - col("cnt"))) / col("cnt")
      min_by(when(hit, round(est, 4)), when(hit, col("bin"))).as(label)
    }
    val aggs = max(col("n")).as("n") +: ests
    cum.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(groupCol)
  }

  /** Surface query: per-language doc-length percentiles. */
  def histQuantileQuery(s: SparkSession, dir: String): DataFrame =
    histQuantile(Tables.documents(s, dir).select("lang", "n_chars"),
      "lang", "n_chars")

  /** CORPUS HEALTH — the curation dashboard as one query, composing
    * the sketch family per language: volumes (docs, tokens), the KMV
    * distinct-content estimate with its implied duplicate share, and
    * token-count percentiles from the histogram sketch. This is the
    * report a 100 TB pipeline runs after every ingest wave to decide
    * what to dedup, downsample, or investigate — and every column is
    * either exact integers or an oracle-checkable deterministic
    * estimate, so the whole dashboard sits under the DuckDB gate.
    * (dup_share clamps at 0: the KMV estimate's ±13% noise can land
    * above the true distinct count on a clean corpus.)
    */
  /** Corpus MIXTURE table — the input to domain reweighting: per
    * (source, lang) document and token volumes plus each cell's
    * token share of the whole corpus. share = cell/total is one
    * integer-exact division (both sums are exact BIGINTs), so the
    * report is bit-deterministic; target mixture ÷ this share is
    * precisely the rate vector [[Sampling.stratifiedSample]] and
    * [[Sampling.weightedSample]] consume. One scan, one grouped
    * aggregate, a broadcast-sized window for the total.
    */
  def corpusMixture(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    // (sources × langs)-sized; checkpointed because the grand total
    // and the share projection both read it — the unpartitioned
    // window this replaces pulled the (bounded) frame into one
    // partition and tripped WindowExec's degradation warning on
    // every run; the 1-row total broadcasts instead (the Q22/Q15
    // scalar pattern)
    val grouped = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .localCheckpoint()
    val total = grouped.agg(sum("n_tokens").as("tot"))
    grouped.crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("tot"), 6).as("tok_share"))
      .orderBy("source", "lang")
  }

  /** TEMPERATURE-SCALED sampling mixture (α = 0.5): the standard
    * multi-source rebalancing rule q_s ∝ p_s^α — big sources give up
    * share, small sources gain, without any source going to zero.
    * Per source: raw token share, the α-scaled share, and the
    * up/down-sampling boost q/p a sampler applies. Same skeleton as
    * [[corpusMixture]]: one scan into a source-count-sized aggregate,
    * 1-row totals broadcast (no unpartitioned window). α is fixed at
    * 0.5 so both engines evaluate it as sqrt — `pow(x, 0.5)` is not
    * guaranteed bit-equal to `sqrt(x)` across libms.
    */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(s, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .localCheckpoint()
    val t = g.agg(sum("n_tokens").as("tot"),
      sum(sqrt(col("n_tokens"))).as("tot_p"))
    g.crossJoin(broadcast(t))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("tot"), 6).as("raw_share"),
        round(sqrt(col("n_tokens")) / col("tot_p"), 6).as("temp_share"),
        round((sqrt(col("n_tokens")) / col("tot_p"))
          / (col("n_tokens") / col("tot")), 4).as("boost"))
      .orderBy("source")
  }

  def corpusHealth(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("lang"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val base = docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    val distinctEst = kmvDistinct(docs.select("lang", "text"),
        "lang", "text")
      .select(col("lang"), col("est_distinct"))
    val pctl = histQuantile(docs.select("lang", "n_tok"),
        "lang", "n_tok", binWidth = 16)
      .select(col("lang"), col("p50_est").as("p50_tok"),
        col("p95_est").as("p95_tok"))
    base.join(distinctEst, "lang").join(pctl, "lang")
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("est_distinct"),
        round(greatest(lit(0.0),
          lit(1.0) - col("est_distinct") / col("n_docs")), 4)
          .as("dup_share"),
        col("p50_tok"), col("p95_tok"))
      .orderBy("lang")
  }

  // ----------------------------------------------------------- count-min

  /** Count-min sketch (Cormode & Muthukrishnan '05) — the mergeable
    * FREQUENCY summary completing the sketch family (KMV: distinct
    * counts, histogram: quantiles, CMS: per-item counts). `depth`
    * independent md5-derived hash rows × `width` buckets; an item's
    * estimate is the MIN of its `depth` bucket counts — never an
    * undercount, over by at most the collisions in its emptiest row.
    *
    * The STATE is a plain (d, bucket) count aggregate: bounded at
    * depth × width longs however large the corpus, map-side partial-
    * aggregated, and MERGEABLE by addition — per-source sketches fold
    * into the global one without rescanning, and the same aggregation
    * streams (bin counts are additive, so micro-batch waves fold like
    * partitions — the histogram's state/finalize split applies
    * verbatim). A full `groupBy(term) count` shuffles the whole
    * vocabulary; the sketch exchange carries ≤ depth·width rows.
    *
    * Determinism: hashes are md5-derived and counts are integers, so
    * estimates — collisions included — replay bit-for-bit on any
    * engine and the DuckDB oracle checks them exactly.
    */
  def cmsState(toks: DataFrame, tokCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame =
    toks.select(explode(cmsHashes(col(tokCol), depth, width)).as("h"))
      .select(col("h.d").as("d"), col("h.bucket").as("bucket"))
      .groupBy("d", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** The `depth` (row, bucket) coordinates of one item — shared by
    * state build and probe so the two cannot drift.
    */
  private def cmsHashes(tok: org.apache.spark.sql.Column,
                        depth: Int, width: Int) =
    array((0 until depth).map(j =>
      struct(lit(j.toLong).as("d"),
        pmod(Md5Prefix60(concat(lit(s"$j|"), tok)), lit(width.toLong))
          .as("bucket"))): _*)

  /** Probe the sketch for a CANDIDATE item set and keep the top-k by
    * estimated count (ties by term). Here the candidates are the
    * corpus vocabulary (sublinear in corpus size, and the state side
    * of the join is depth·width rows — broadcast); at 100 TB the same
    * probe serves whatever candidate list the caller brings (a
    * per-partition local-top-k union is the standard generator) —
    * the sketch itself never needs the vocabulary.
    */
  def cmsTopK(toks: DataFrame, tokCol: String, k: Int,
              depth: Int = 4, width: Int = 1024): DataFrame =
    cmsProbeTopK(cmsState(toks, tokCol, depth, width),
      toks.select(col(tokCol)).distinct(), tokCol, k, depth, width)

  /** The finish half, split from the state so a STREAM can maintain
    * the state and finalize on demand (the histogram's state/finalize
    * pattern): probe a prebuilt sketch state with a candidate frame.
    */
  def cmsProbeTopK(state: DataFrame, candidates: DataFrame, tokCol: String,
                   k: Int, depth: Int = 4, width: Int = 1024): DataFrame = {
    val probes = candidates
      .select(col(tokCol), explode(cmsHashes(col(tokCol), depth, width))
        .as("h"))
      .select(col(tokCol), col("h.d").as("d"), col("h.bucket").as("bucket"))
    probes.join(broadcast(state), Seq("d", "bucket"))
      .groupBy(tokCol)
      .agg(min(col("cnt")).as("est"))
      .orderBy(desc("est"), col(tokCol))
      .limit(k)
  }

  def cmsTopTermsQuery(s: SparkSession, dir: String): DataFrame =
    cmsTopK(Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok")),
      "tok", k = 15)

  /** Grouped CMS — one sketch per group, the grouped form KMV and the
    * histogram already have: state ≤ groups × depth × width counts
    * (still corpus-size-independent per group), merging by addition
    * within AND across groups, so per-source sketches roll up exactly
    * like the other families'.
    */
  def cmsStateBy(toks: DataFrame, groupCol: String, tokCol: String,
                 depth: Int = 4, width: Int = 1024): DataFrame =
    toks.select(col(groupCol),
        explode(cmsHashes(col(tokCol), depth, width)).as("h"))
      .select(col(groupCol), col("h.d").as("d"), col("h.bucket").as("bucket"))
      .groupBy(groupCol, "d", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Per-group top-k by estimated count (ties by term). The input is
    * read twice — once aggregated into the state, once distinct-ed
    * into candidates: both passes are one narrow codegen pipeline
    * over the tokens, and checkpointing the exploded token stream to
    * save the second would materialize a corpus-token-sized frame
    * (recompute-over-persist, SURVEY §4 — unlike BM25's postings
    * checkpoint, nothing here is query-filtered to a bounded size).
    */
  def cmsTopKBy(toks: DataFrame, groupCol: String, tokCol: String,
                k: Int, depth: Int = 4, width: Int = 1024): DataFrame =
    cmsProbeTopKBy(cmsStateBy(toks, groupCol, tokCol, depth, width),
      toks.select(col(groupCol), col(tokCol)).distinct(),
      groupCol, tokCol, k, depth, width)

  /** The grouped finish half, split from the state like
    * [[cmsProbeTopK]] — a stream maintaining [[cmsStateBy]] state (or
    * a caller with its own candidate list) finalizes through this,
    * so the oracle-pinned tie-break (est DESC, term) lives in exactly
    * one place. The probe joins a broadcast
    * (groups × depth × width)-row summary.
    */
  def cmsProbeTopKBy(state: DataFrame, candidates: DataFrame,
                     groupCol: String, tokCol: String, k: Int,
                     depth: Int = 4, width: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = candidates
      .select(col(groupCol), col(tokCol),
        explode(cmsHashes(col(tokCol), depth, width)).as("h"))
      .select(col(groupCol), col(tokCol),
        col("h.d").as("d"), col("h.bucket").as("bucket"))
    probes.join(broadcast(state), Seq(groupCol, "d", "bucket"))
      .groupBy(groupCol, tokCol)
      .agg(min(col("cnt")).as("est"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(groupCol).orderBy(desc("est"), col(tokCol))))
      .where(col("rk") <= k)
      .select(col(groupCol), col("rk"), col(tokCol), col("est"))
      .orderBy(groupCol, "rk")
  }

  def cmsByLangQuery(s: SparkSession, dir: String): DataFrame =
    cmsTopKBy(Tables.documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok")),
      "lang", "tok", k = 5)

  // ------------------------------------------------------------- HLL

  /** HYPERLOGLOG distinct-count sketch — the OTHER industry-standard
    * mergeable cardinality summary beside [[kmvDistinct]], with a
    * fundamentally different state shape: m=2^b FIXED registers
    * (bucket → max leading-zero run) instead of a k-min value set.
    * Registers merge by element-wise max — the property that makes
    * HLL the de-facto cube/rollup sketch — and the whole pipeline is
    * two ordinary hash aggregations, no UDAF: the inner
    * (group, bucket) agg is map-side partial, so the exchange
    * carries at most m rows per group per partition.
    *
    * Determinism: the usual objection to oracling HLL is its
    * implementation-defined register layout. Here the layout is
    * DEFINED, from the same md5-prefix hash the KMV family uses —
    * bucket = top b bits of the 60-bit hash, ρ = leading-zero count
    * of the remaining 54 bits + 1 (computed with integer/`bin()`
    * arithmetic, no floats) — so a DuckDB mirror reproduces every
    * register and the estimate bit-for-bit. The estimator keeps the
    * indicator sum IN INTEGERS (Σ 2^-ρ scaled by 2^55, each term a
    * power of two) so no float-summation-order hazard exists; the
    * only float ops are one shared-literal multiply chain, one
    * division, and the small-range `ln` branch (Flajolet et al.'s
    * linear counting for raw ≤ 2.5m with empty registers) — all
    * checked to sit ≥10⁶ ulps from every 4-decimal rounding boundary.
    */
  private val HllRestBits = 54 // 60-bit hash − 6 bucket bits
  val HllM = 64

  /** Per-(group, bucket) register table: r = max ρ. */
  def hllRegisters(df: DataFrame, groupCol: String,
                   valueCol: String): DataFrame =
    df.select(col(groupCol),
        graft.functions.Md5Prefix60(col(valueCol).cast("string")).as("h"))
      .select(col(groupCol),
        shiftright(col("h"), HllRestBits).as("bucket"),
        col("h").bitwiseAND(lit((1L << HllRestBits) - 1)).as("rest"))
      .select(col(groupCol), col("bucket"),
        when(col("rest") === 0, lit(HllRestBits + 1))
          .otherwise(lit(HllRestBits + 1) - length(bin(col("rest"))))
          .cast("long").as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("r"))

  /** Estimate per group from a register table. The indicator sum is
    * integer-exact: Σ_buckets 2^(55−r) plus 2^55 per absent bucket,
    * all longs; α·m²·2^55 is 0.709 times powers of two, so both
    * engines derive the identical double from the literal 0.709.
    */
  private def hllEstimate(regs: DataFrame, groupCol: String): DataFrame = {
    val sScaled = (col("sp") +
      (lit(HllM.toLong) - col("nb")) * lit(1L << 55)).cast("double")
    val raw = (lit(0.709) * lit(4096.0) * lit((1L << 55).toDouble)) / sScaled
    val vz = lit(HllM.toLong) - col("nb")
    regs.groupBy(groupCol)
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - r AS INT))"))
          .as("sp"),
        count(lit(1)).as("nb"))
      .select(col(groupCol), vz.as("v_zero"),
        round(when(raw <= lit(2.5 * HllM) && vz > 0,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / vz.cast("double")))
          .otherwise(raw), 4).as("est_distinct"))
  }

  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, valueCol), groupCol)
      .orderBy(groupCol)

  /** Finalize a register table (e.g. the streaming state — the
    * registers are the streamable half: ONE max aggregation, state
    * bounded at groups×m rows forever) into the estimate. Same
    * state/finalize split as the histogram and CMS sketches.
    */
  def hllFinish(regs: DataFrame, groupCol: String): DataFrame =
    hllEstimate(regs, groupCol).orderBy(groupCol)

  /** SKETCH CALIBRATION REPORT — measured KMV and HLL estimates
    * against the EXACT distinct count, per group (the bloom_fpr
    * discipline applied to the cardinality sketches: an estimator
    * you have not calibrated on your own data is a rumor): relative
    * error = (est − exact)/exact, one division of a 4dp-pinned
    * estimate by an exact long — identical doubles on both engines.
    * Costs one exact count(distinct) beside the two sketch passes;
    * at 100 TB this runs on a SAMPLE split while the sketches run
    * on everything — the report's point is the error bar, which
    * transfers.
    */
  def sketchErrorReport(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("event_type", "user_id")
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_distinct"))
    val kmv = kmvDistinct(ev, "event_type", "user_id")
      .select(col("event_type"), col("est_distinct").as("kmv_est"))
    val hll = hllDistinct(ev, "event_type", "user_id")
      .select(col("event_type"), col("est_distinct").as("hll_est"))
    exact.join(kmv, "event_type").join(hll, "event_type")
      .select(col("event_type"), col("exact_distinct"),
        col("kmv_est"),
        round((col("kmv_est") - col("exact_distinct"))
          / col("exact_distinct"), 6).as("kmv_rel_err"),
        col("hll_est"),
        round((col("hll_est") - col("exact_distinct"))
          / col("exact_distinct"), 6).as("hll_rel_err"))
      .orderBy("event_type")
  }

  /** Surface query: estimated distinct users per event type — the
    * same question [[kmvQuery]] answers, through the register
    * sketch, so the two estimators are directly comparable in the
    * registry output.
    */
  def hllQuery(s: SparkSession, dir: String): DataFrame =
    hllDistinct(Tables.events(s, dir).select("event_type", "user_id"),
      "event_type", "user_id")

  /** DRIFT MONITOR — Population Stability Index between two ingest
    * waves (the standard "did the data change under me" alarm;
    * PSI < 0.1 stable, > 0.25 investigate): per language, the
    * doc-length distribution of the md5 half-split's two waves
    * compared bin-by-bin, PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) with
    * add-1 smoothing so a bin empty on one side contributes a large
    * finite term instead of ∞. Determinism: shares are ratios of
    * exact integers (identical doubles), each bin's term
    * micro-quantizes to a BIGINT before the per-language sum (the
    * exact-aggregate rule — a float Σ over bins would be
    * fold-order-dependent), ln per the zipfFit precedent. One scan,
    * (lang, bin) aggregate — bins are metadata-sized; in production
    * wave A is the previous snapshot's persisted bin table and only
    * wave B rescans.
    */
  def driftPsi(s: SparkSession, dir: String, binW: Long = 64L): DataFrame = {
    val d = Tables.documents(s, dir).select(col("lang"),
      (graft.operators.Sampling.hashBucket(col("doc_id")) < lit("8000"))
        .as("ha"),
      expr(s"n_chars div ${binW}L").as("bin"))
    val bins = d.groupBy("lang", "bin")
      .agg(sum(when(col("ha"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("ha"), 1L).otherwise(0L)).as("cb"))
    val tot = bins.groupBy("lang").agg(sum("ca").as("ta"),
      sum("cb").as("tb"), count(lit(1)).as("nb"))
    bins.join(tot, "lang")
      .select(col("lang"), col("ta"), col("tb"), col("nb"),
        // PURE-DOUBLE term — the embedDriftPsi seed-707 fix: `* 1.0 /`
        // was DECIMAL in Spark vs the oracle's DOUBLE division, and
        // the gap can flip the micro-round near a .5 term
        expr("CAST(round((CAST(ca + 1 AS DOUBLE) / CAST(ta + nb AS DOUBLE) " +
          "- CAST(cb + 1 AS DOUBLE) / CAST(tb + nb AS DOUBLE)) " +
          "* ln((CAST(ca + 1 AS DOUBLE) / CAST(ta + nb AS DOUBLE)) " +
          "/ (CAST(cb + 1 AS DOUBLE) / CAST(tb + nb AS DOUBLE))) " +
          "* CAST(1000000 AS DOUBLE)) AS BIGINT)")
          .as("tm"))
      .groupBy("lang")
      .agg(max("ta").as("n_a"), max("tb").as("n_b"),
        max("nb").as("n_bins"),
        // exact integer half-up at 4dp — the embedDriftPsi twin's
        // seed-707 boundary fix; PSI terms ≥ 0, floor form = half-up
        expr("CAST((sum(tm) * 20000 + 1000000) div 2000000 AS DOUBLE)" +
          " / 10000.0").as("psi"))
      .orderBy("lang")
  }

  /** HLL rollup — per-group estimates plus a global one derived by
    * REGISTER-WISE MAX across the per-group register tables, never
    * rescanning the data: max commutes with max, so the merged
    * registers equal what a direct global sketch would hold. The
    * register table is groups×m rows — sketch-sized, checkpointed
    * once for its two consumers (the kmvRollup rule).
    */
  def hllRollup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val regs = hllRegisters(df, groupCol, valueCol).localCheckpoint(true)
    val per = hllEstimate(regs, groupCol)
      .select(col(groupCol).cast("string").as("grp"), col("v_zero"),
        col("est_distinct"))
    val global = hllEstimate(
      regs.groupBy("bucket").agg(max("r").as("r"))
        .select(lit("__all__").as("grp"), col("bucket"), col("r")),
      "grp")
    per.unionByName(global).orderBy("grp")
  }

  def hllRollupQuery(s: SparkSession, dir: String): DataFrame =
    hllRollup(Tables.events(s, dir).select("event_type", "user_id"),
      "event_type", "user_id")
}
