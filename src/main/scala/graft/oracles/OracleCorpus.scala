package graft

/** Corpus-family oracle SQL — split verbatim from SparkEntry
  * (r12, r11 verdict #7). The registry stays in SparkEntry;
  * these maps are its DuckDB mirrors, byte-identical to the
  * pre-split strings.
  */
private[graft] object OracleCorpus {
  import OracleCtes._

  val sql: Map[String, String] = Map(
    // Heaps-law vocabulary growth: docs cut into rank deciles, each
    // word charged to its FIRST doc's decile, cumulative vocabulary
    "corpus_vocab_growth" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |nr AS (SELECT count(*) AS n FROM d),
        |rk AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
        |       FROM d),
        |bkt AS (SELECT doc_id, ((rn - 1) * 10) // n + 1 AS bucket
        |        FROM rk CROSS JOIN nr),
        |fw AS (SELECT tok, min(doc_id) AS doc_id FROM
        |         (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |          FROM d)
        |       GROUP BY 1),
        |pb AS (SELECT b.bucket, CAST(count(*) AS BIGINT) AS new_words
        |       FROM fw JOIN bkt b ON fw.doc_id = b.doc_id GROUP BY 1),
        |db AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs
        |       FROM bkt GROUP BY 1)
        |SELECT db.bucket, db.n_docs,
        |       coalesce(pb.new_words, 0) AS new_words,
        |       CAST(sum(db.n_docs) OVER (ORDER BY db.bucket) AS BIGINT)
        |         AS n_docs_cum,
        |       CAST(sum(coalesce(pb.new_words, 0))
        |         OVER (ORDER BY db.bucket) AS BIGINT) AS vocab_cum
        |FROM db LEFT JOIN pb USING (bucket) ORDER BY bucket""".stripMargin,
    // cross-source near-dup overlap: verified pairs joined to each
    // side's source, counted per unordered source pair
    // exact global deciles of the quality score; mirror assigns
    // decile by the same all-integer (rank-1)*10 div N formula over
    // the identical (score 4dp, doc_id) total order
    // budget-constrained selection: (quality DESC, doc_id) prefix
    // while the running token sum fits; the Spark side's banded
    // two-level rank+cumsum reproduces exactly this total order
    "corpus_budget_select" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |m AS (SELECT doc_id, len(toks) AS n_tokens,
        |        len(list_filter(toks,
        |          t -> t IN ('the','a','and','of','to','in','is')))
        |          *1.0/len(toks) AS sw,
        |        1.0 - len(list_distinct(toks))*1.0/len(toks) AS rep
        |      FROM t),
        |q AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |        round((least(n_tokens/50.0, 1.0)
        |          + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
        |          + (1.0 - least(rep/0.9, 1.0))) / 3.0, 4) AS quality_score
        |      FROM m),
        |r AS (SELECT doc_id, quality_score, n_tokens,
        |        row_number() OVER (ORDER BY quality_score DESC, doc_id)
        |          AS rnk,
        |        sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS cum_tokens
        |      FROM q WHERE quality_score IS NOT NULL)
        |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, quality_score,
        |       n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM r WHERE cum_tokens <= 10000 ORDER BY rnk""".stripMargin,
    // one-row embedding norm audit in integer micro-units
    // per-dimension variance from exact micro moments; dead flag
    // compares identical doubles at 1e-6
    // quantile_cont ≡ Spark's exact `percentile` (both linear
    // interpolation at index p·(n−1))
    "corpus_stats" ->
      """WITH d AS (SELECT lang, len(string_split(text, ' ')) AS n_toks,
        |                  n_chars
        |           FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
        |       round(avg(n_toks), 4) AS avg_tokens,
        |       round(quantile_cont(n_toks, 0.5), 4) AS p50_tokens,
        |       round(quantile_cont(n_toks, 0.95), 4) AS p95_tokens,
        |       round(avg(n_chars), 4) AS avg_chars
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    // thresholds are hexThreshold(rate) literals: 0.25→'4000',
    // 0.75→'c000', 0.8→'cccd', 0.9→'e666'; fixed-width lowercase hex
    // compares lexicographically ≡ numerically on both engines
    // export sharding: the two-level distributed prefix sum collapses
    // to ONE global window in the mirror because the global order is
    // bucket-major — (bk, h, doc_id) — by construction; all-integer
    // arithmetic, so offsets and shard ids match bit-for-bit
    // thresholds are hexThreshold(rate) literals: 0.25→'4000',
    // 0.75→'c000', 0.8→'cccd', 0.9→'e666'; fixed-width lowercase hex
    // compares lexicographically ≡ numerically on both engines
    // export sharding: the two-level distributed prefix sum collapses
    // to ONE global window in the mirror because the global order is
    // bucket-major — (bk, h, doc_id) — by construction; all-integer
    // arithmetic, so offsets and shard ids match bit-for-bit
    "export_shards" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |               AS BIGINT) AS h
        |           FROM documents),
        |b AS (SELECT *, h % 64 AS bk FROM t),
        |c AS (SELECT doc_id, n_tok,
        |             CAST(sum(n_tok) OVER (ORDER BY bk, h, doc_id)
        |               AS BIGINT) AS cum
        |      FROM b)
        |SELECT doc_id, n_tok, cum - n_tok AS start_tok,
        |       (cum - n_tok) // 2000 AS shard
        |FROM c ORDER BY start_tok, doc_id""".stripMargin,
    // manifest over the same shard chain: order-sensitive md5 via
    // string_agg(... ORDER BY start_tok, doc_id) ≡ Spark's sorted
    // collect_list concat — same string, same hash
    // manifest over the same shard chain: order-sensitive md5 via
    // string_agg(... ORDER BY start_tok, doc_id) ≡ Spark's sorted
    // collect_list concat — same string, same hash
    "export_shard_manifest" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |               AS BIGINT) AS h
        |           FROM documents),
        |b AS (SELECT *, h % 64 AS bk FROM t),
        |c AS (SELECT doc_id, n_tok,
        |             CAST(sum(n_tok) OVER (ORDER BY bk, h, doc_id)
        |               AS BIGINT) AS cum
        |      FROM b),
        |sh AS (SELECT doc_id, n_tok, cum - n_tok AS start_tok,
        |         (cum - n_tok) // 2000 AS shard
        |       FROM c)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |       md5(string_agg(CAST(doc_id AS VARCHAR), '|'
        |         ORDER BY start_tok, doc_id)) AS fingerprint
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,
    // hash-coin hygiene: 64-bucket chi2 vs uniform with empty
    // buckets anchored; x64-scaled integer numerator
    // hash-coin hygiene: 64-bucket chi2 vs uniform with empty
    // buckets anchored; x64-scaled integer numerator
    "hash_uniformity_audit" ->
      """WITH c AS (SELECT CAST('0x' || substr(md5(CAST(doc_id
        |             AS VARCHAR)), 1, 15) AS BIGINT) % 64 AS bucket
        |           FROM documents),
        |oc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS o
        |       FROM c GROUP BY 1),
        |g AS (SELECT u.b AS bucket, coalesce(oc.o, 0) AS o
        |      FROM (SELECT unnest(range(0, 64)) AS b) u
        |      LEFT JOIN oc ON u.b = oc.bucket),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM g)
        |SELECT t.n AS n_docs, CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(min(g.o) AS BIGINT) AS min_bucket,
        |       CAST(max(g.o) AS BIGINT) AS max_bucket,
        |       round(CAST(sum(CAST(g.o * 64 - t.n AS HUGEINT)
        |           * CAST(g.o * 64 - t.n AS HUGEINT)) AS DOUBLE)
        |         / CAST(t.n * 64 AS DOUBLE), 4) AS chi2
        |FROM g CROSS JOIN t GROUP BY t.n""".stripMargin,
    "corpus_sample_split" ->
      """WITH b AS (SELECT doc_id, lang, source,
        |                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
        |           FROM documents),
        |s AS (SELECT * FROM b
        |      WHERE bucket < CASE WHEN lang = 'en' THEN '4000'
        |                          ELSE 'c000' END)
        |SELECT doc_id, lang, source,
        |       CASE WHEN bucket < 'cccd' THEN 'train'
        |            WHEN bucket < 'e666' THEN 'val'
        |            ELSE 'test' END AS split
        |FROM s ORDER BY doc_id""".stripMargin,
    // deterministic reservoir: k smallest md5-hashes per stratum;
    // the hash is reduced mod 2^50 (exact in the heap's double key)
    // and ties break on doc_id — the rank window here is the MIRROR
    // of the bounded TopKAgg heap, not the plan
    // deterministic reservoir: k smallest md5-hashes per stratum;
    // the hash is reduced mod 2^50 (exact in the heap's double key)
    // and ties break on doc_id — the rank window here is the MIRROR
    // of the bounded TopKAgg heap, not the plan
    "corpus_reservoir" ->
      """WITH h AS (SELECT lang, doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 1125899906842624 AS h50
        |  FROM documents),
        |r AS (SELECT lang, doc_id, h50,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY h50, doc_id) AS rk
        |      FROM h)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, h50
        |FROM r WHERE rk <= 25 ORDER BY lang, rk""".stripMargin,
    // DSIR importance resampling: md5-bucketed token distributions,
    // add-1 smoothing, per-bucket micro-nat scores as exact BIGINTs,
    // doc weight = exact integer sum → bit-stable top-K cut
    // DSIR importance resampling: md5-bucketed token distributions,
    // add-1 smoothing, per-bucket micro-nat scores as exact BIGINTs,
    // doc weight = exact integer sum → bit-stable top-K cut
    "dsir_select" ->
      """WITH tb AS (SELECT doc_id, lang,
        |    CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) % 64 AS b
        |  FROM (SELECT doc_id, lang,
        |          unnest(string_split(text, ' ')) AS tok
        |        FROM documents)),
        |cp AS (SELECT b, CAST(count(*) AS BIGINT) AS cp FROM tb
        |       WHERE lang = 'en' GROUP BY b),
        |cq AS (SELECT b, CAST(count(*) AS BIGINT) AS cq FROM tb
        |       WHERE lang <> 'en' GROUP BY b),
        |bb AS (SELECT CAST(range AS BIGINT) AS b FROM range(64)),
        |m AS (SELECT bb.b, coalesce(cp.cp, 0) AS cp,
        |        coalesce(cq.cq, 0) AS cq
        |      FROM bb LEFT JOIN cp ON bb.b = cp.b
        |        LEFT JOIN cq ON bb.b = cq.b),
        |t AS (SELECT CAST(sum(cp) AS BIGINT) AS tp,
        |        CAST(sum(cq) AS BIGINT) AS tq FROM m),
        |sc AS (SELECT m.b,
        |        CAST(round((ln((m.cp + 1) * (t.tq + 64)) -
        |          ln((m.cq + 1) * (t.tp + 64))) * 1000000) AS BIGINT)
        |          AS sb
        |       FROM m, t),
        |dw AS (SELECT tb.doc_id, tb.lang,
        |        CAST(count(*) AS BIGINT) AS n_tokens,
        |        CAST(sum(sc.sb) AS BIGINT) AS lw
        |       FROM tb JOIN sc ON tb.b = sc.b WHERE tb.lang <> 'en'
        |       GROUP BY 1, 2)
        |SELECT doc_id, lang, n_tokens,
        |  (CASE WHEN lw >= 0 THEN (lw + 50) // 100
        |        ELSE -((-lw + 50) // 100) END) / 10000.0 AS log_weight
        |FROM dw ORDER BY lw DESC, doc_id LIMIT 50""".stripMargin,
    // Poisson PPS sample (Sampling.weightedSample): p = min(1,
    // 150·w/W) with W an exact integer sum; u = md5-60-bit/2^60 —
    // +,·,/ only, so the keep decision replays bit-for-bit
    // Poisson PPS sample (Sampling.weightedSample): p = min(1,
    // 150·w/W) with W an exact integer sum; u = md5-60-bit/2^60 —
    // +,·,/ only, so the keep decision replays bit-for-bit
    "corpus_weighted_sample" ->
      """WITH w AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tw FROM documents),
        |c AS (SELECT doc_id, lang, n_chars,
        |        least(CAST(1.0 AS DOUBLE),
        |          (CAST(150.0 AS DOUBLE) * CAST(n_chars AS DOUBLE))
        |            / CAST(w.tw AS DOUBLE)) AS pfull,
        |        CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |               AS BIGINT) AS DOUBLE)
        |          / CAST(1152921504606846976 AS DOUBLE) AS u
        |      FROM documents, w)
        |SELECT doc_id, lang, n_chars, round(pfull, 6) AS p
        |FROM c WHERE u < pfull ORDER BY doc_id""".stripMargin,
    // KMV sketch (Sketch.kmvDistinct, k=64): distinct 60-bit hashes,
    // k-th smallest per group, estimate (k-1)·2^60/kth — exact below
    // k. The sketch state is engine-side only; the estimate is a pure
    // function of the data, which is what the oracle mirrors.
    // KMV sketch (Sketch.kmvDistinct, k=64): distinct 60-bit hashes,
    // k-th smallest per group, estimate (k-1)·2^60/kth — exact below
    // k. The sketch state is engine-side only; the estimate is a pure
    // function of the data, which is what the oracle mirrors.
    "sketch_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h,
        |             row_number() OVER (PARTITION BY event_type ORDER BY h)
        |               AS rn
        |      FROM h),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
        |             max(CASE WHEN rn = 64 THEN h END) AS kth
        |      FROM r GROUP BY event_type)
        |SELECT event_type, least(nd, 64) AS n_seen,
        |       CASE WHEN nd < 64 THEN round(CAST(nd AS DOUBLE), 4)
        |            ELSE round((CAST(63.0 AS DOUBLE)
        |                          * CAST(1152921504606846976 AS DOUBLE))
        |                       / CAST(kth AS DOUBLE), 4) END AS est_distinct
        |FROM s ORDER BY event_type""".stripMargin,
    // HLL sketch (Sketch.hllDistinct, m=64): registers defined from
    // the same md5-prefix60 hash (bucket = top 6 bits, ρ = leading
    // zeros of the remaining 54 + 1 via bin()), indicator sum kept in
    // scaled integers (Σ 2^(55−r)), so the estimate is bit-exact in
    // both engines; ln only in the small-range branch, 4dp-rounded
    // HLL sketch (Sketch.hllDistinct, m=64): registers defined from
    // the same md5-prefix60 hash (bucket = top 6 bits, ρ = leading
    // zeros of the remaining 54 + 1 via bin()), indicator sum kept in
    // scaled integers (Σ 2^(55−r)), so the estimate is bit-exact in
    // both engines; ln only in the small-range branch, 4dp-rounded
    "sketch_hll_distinct" ->
      """WITH h AS (SELECT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events),
        |b AS (SELECT event_type, h >> 54 AS bucket,
        |             h & 18014398509481983 AS rest FROM h),
        |r AS (SELECT event_type, bucket,
        |        CAST(max(CASE WHEN rest = 0 THEN 55
        |                 ELSE 55 - length(bin(rest)) END) AS BIGINT) AS r
        |      FROM b GROUP BY 1, 2),
        |a AS (SELECT event_type,
        |        CAST(sum(1::BIGINT << CAST(55 - r AS INT)) AS BIGINT) AS sp,
        |        CAST(count(*) AS BIGINT) AS nb
        |      FROM r GROUP BY 1),
        |e AS (SELECT event_type, CAST(64 - nb AS BIGINT) AS v_zero,
        |        (CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |           * CAST(36028797018963968 AS DOUBLE))
        |          / CAST(sp + (64 - nb) * 36028797018963968 AS DOUBLE)
        |          AS raw
        |      FROM a)
        |SELECT event_type, v_zero,
        |       round(CASE WHEN raw <= 160.0 AND v_zero > 0
        |              THEN 64.0 * ln(64.0 / v_zero) ELSE raw END, 4)
        |         AS est_distinct
        |FROM e ORDER BY event_type""".stripMargin,
    // HLL rollup: per-group registers plus a register-wise max merge
    // for the '__all__' row — the same estimate expression applied to
    // both register tables, never rescanning events
    // HLL rollup: per-group registers plus a register-wise max merge
    // for the '__all__' row — the same estimate expression applied to
    // both register tables, never rescanning events
    "sketch_hll_rollup" ->
      """WITH h AS (SELECT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events),
        |b AS (SELECT event_type, h >> 54 AS bucket,
        |             h & 18014398509481983 AS rest FROM h),
        |r AS (SELECT event_type AS grp, bucket,
        |        CAST(max(CASE WHEN rest = 0 THEN 55
        |                 ELSE 55 - length(bin(rest)) END) AS BIGINT) AS r
        |      FROM b GROUP BY 1, 2),
        |rall AS (SELECT grp, bucket, r FROM r
        |         UNION ALL
        |         SELECT '__all__' AS grp, bucket, max(r) FROM r GROUP BY 2),
        |a AS (SELECT grp,
        |        CAST(sum(1::BIGINT << CAST(55 - r AS INT)) AS BIGINT) AS sp,
        |        CAST(count(*) AS BIGINT) AS nb
        |      FROM rall GROUP BY 1),
        |e AS (SELECT grp, CAST(64 - nb AS BIGINT) AS v_zero,
        |        (CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |           * CAST(36028797018963968 AS DOUBLE))
        |          / CAST(sp + (64 - nb) * 36028797018963968 AS DOUBLE)
        |          AS raw
        |      FROM a)
        |SELECT grp, v_zero,
        |       round(CASE WHEN raw <= 160.0 AND v_zero > 0
        |              THEN 64.0 * ln(64.0 / v_zero) ELSE raw END, 4)
        |         AS est_distinct
        |FROM e ORDER BY grp""".stripMargin,
    // mixture table: integer-exact volumes; tok_share is one exact
    // BIGINT/BIGINT division → identical IEEE double in both engines
    // mixture table: integer-exact volumes; tok_share is one exact
    // BIGINT/BIGINT division → identical IEEE double in both engines
    "corpus_mixture" ->
      """WITH d AS (SELECT source, lang,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |      FROM d GROUP BY 1, 2)
        |SELECT source, lang, n_docs, n_tokens,
        |       round(n_tokens / CAST(sum(n_tokens) OVER () AS BIGINT), 6)
        |         AS tok_share
        |FROM g ORDER BY source, lang""".stripMargin,
    // temperature-scaled mixture (α=0.5 evaluated as sqrt — pow(x,.5)
    // is not guaranteed bit-equal to sqrt across libms)
    // temperature-scaled mixture (α=0.5 evaluated as sqrt — pow(x,.5)
    // is not guaranteed bit-equal to sqrt across libms)
    "corpus_temperature_mix" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |               AS n_tokens
        |           FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
        |        sum(sqrt(n_tokens)) AS tot_p
        |      FROM g)
        |SELECT g.source, g.n_docs, g.n_tokens,
        |       round(g.n_tokens / t.tot, 6) AS raw_share,
        |       round(sqrt(g.n_tokens) / t.tot_p, 6) AS temp_share,
        |       round((sqrt(g.n_tokens) / t.tot_p)
        |         / (g.n_tokens / t.tot), 4) AS boost
        |FROM g CROSS JOIN t ORDER BY source""".stripMargin,
    // corpus health dashboard: exact volumes + the KMV estimate
    // (md5-60 k-min over text) + histogram token percentiles, all
    // joined per language; dup_share clamps at 0 (estimate noise)
    // PSI drift monitor: md5 half-split waves, add-1-smoothed bin
    // shares from exact integers, per-bin term micro-quantized to a
    // BIGINT before the per-language sum
    // corpus health dashboard: exact volumes + the KMV estimate
    // (md5-60 k-min over text) + histogram token percentiles, all
    // joined per language; dup_share clamps at 0 (estimate noise)
    // PSI drift monitor: md5 half-split waves, add-1-smoothed bin
    // shares from exact integers, per-bin term micro-quantized to a
    // BIGINT before the per-language sum
    "corpus_drift_psi" ->
      """WITH d AS (SELECT lang,
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
        |          AS ha,
        |        n_chars // 64 AS bin
        |      FROM documents),
        |bins AS (SELECT lang, bin,
        |        CAST(sum(CASE WHEN ha THEN 1 ELSE 0 END) AS BIGINT)
        |          AS ca,
        |        CAST(sum(CASE WHEN NOT ha THEN 1 ELSE 0 END) AS BIGINT)
        |          AS cb
        |      FROM d GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(sum(ca) AS BIGINT) AS ta,
        |        CAST(sum(cb) AS BIGINT) AS tb,
        |        CAST(count(*) AS BIGINT) AS nb
        |      FROM bins GROUP BY 1),
        |tm AS (SELECT bins.lang, tot.ta, tot.tb, tot.nb,
        |        CAST(round(((ca + 1) * 1.0 / (ta + nb)
        |          - (cb + 1) * 1.0 / (tb + nb))
        |          * ln(((ca + 1) * 1.0 / (ta + nb))
        |          / ((cb + 1) * 1.0 / (tb + nb))) * 1000000) AS BIGINT)
        |          AS tm
        |       FROM bins JOIN tot ON bins.lang = tot.lang)
        |SELECT lang, max(ta) AS n_a, max(tb) AS n_b, max(nb) AS n_bins,
        |  CAST((CAST(sum(tm) AS BIGINT) * 20000 + 1000000)
        |    // 2000000 AS DOUBLE) / 10000.0 AS psi
        |FROM tm GROUP BY 1 ORDER BY lang""".stripMargin,
    "corpus_health" ->
      """WITH d AS (SELECT lang, text,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |base AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |                CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |         FROM d GROUP BY 1),
        |hh AS (SELECT DISTINCT lang,
        |         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
        |       FROM d),
        |rr AS (SELECT lang, h,
        |         row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
        |       FROM hh),
        |sk AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd,
        |              max(CASE WHEN rn = 64 THEN h END) AS kth
        |       FROM rr GROUP BY 1),
        |est AS (SELECT lang,
        |          CASE WHEN nd < 64 THEN round(CAST(nd AS DOUBLE), 4)
        |               ELSE round((CAST(63.0 AS DOUBLE)
        |                             * CAST(1152921504606846976 AS DOUBLE))
        |                          / CAST(kth AS DOUBLE), 4) END
        |            AS est_distinct
        |        FROM sk),
        |hb AS (SELECT lang, CAST(floor(n_tok / 16.0) AS BIGINT) AS bin,
        |              CAST(count(*) AS BIGINT) AS cnt
        |       FROM d WHERE n_tok IS NOT NULL GROUP BY 1, 2),
        |hc AS (SELECT lang, bin, cnt,
        |              CAST(sum(cnt) OVER (PARTITION BY lang
        |                                  ORDER BY bin) AS BIGINT) AS cum,
        |              CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |       FROM hb),
        |ht AS (SELECT lang, bin, cnt, cum, n,
        |              CAST((1 * n + 1) // 2 AS BIGINT) AS t50,
        |              CAST((19 * n + 19) // 20 AS BIGINT) AS t95
        |       FROM hc),
        |hq AS (SELECT lang,
        |         arg_min(CASE WHEN cum >= t50 THEN
        |                   round(16.0 * bin
        |                     + 16.0 * (t50 - (cum - cnt)) / cnt, 4) END,
        |                 CASE WHEN cum >= t50 THEN bin END) AS p50_tok,
        |         arg_min(CASE WHEN cum >= t95 THEN
        |                   round(16.0 * bin
        |                     + 16.0 * (t95 - (cum - cnt)) / cnt, 4) END,
        |                 CASE WHEN cum >= t95 THEN bin END) AS p95_tok
        |       FROM ht GROUP BY lang)
        |SELECT b.lang, b.n_docs, b.n_tokens, e.est_distinct,
        |       round(greatest(CAST(0.0 AS DOUBLE),
        |                      1 - e.est_distinct / b.n_docs), 4)
        |         AS dup_share,
        |       hq.p50_tok, hq.p95_tok
        |FROM base b JOIN est e ON b.lang = e.lang
        |JOIN hq ON b.lang = hq.lang
        |ORDER BY b.lang""".stripMargin,
    // histogram quantile sketch: integer bins and ranks, one float
    // division at the end — DuckDB reproduces the estimate exactly.
    // Window sums cast back to BIGINT (DuckDB widens to HUGEINT).
    // histogram quantile sketch: integer bins and ranks, one float
    // division at the end — DuckDB reproduces the estimate exactly.
    // Window sums cast back to BIGINT (DuckDB widens to HUGEINT).
    "sketch_hist_quantile" ->
      """WITH b AS (SELECT lang,
        |             CAST(floor(n_chars / 64.0) AS BIGINT) AS bin,
        |             CAST(count(*) AS BIGINT) AS cnt
        |           FROM documents WHERE n_chars IS NOT NULL
        |           GROUP BY 1, 2),
        |c AS (SELECT lang, bin, cnt,
        |             CAST(sum(cnt) OVER (PARTITION BY lang
        |                                 ORDER BY bin) AS BIGINT) AS cum,
        |             CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |      FROM b),
        |t AS (SELECT lang, bin, cnt, cum, n,
        |             CAST((1 * n + 1) // 2 AS BIGINT) AS t50,
        |             CAST((19 * n + 19) // 20 AS BIGINT) AS t95
        |      FROM c)
        |SELECT lang, max(n) AS n,
        |       arg_min(CASE WHEN cum >= t50 THEN
        |                 round(64.0 * bin
        |                   + 64.0 * (t50 - (cum - cnt)) / cnt, 4) END,
        |               CASE WHEN cum >= t50 THEN bin END) AS p50_est,
        |       arg_min(CASE WHEN cum >= t95 THEN
        |                 round(64.0 * bin
        |                   + 64.0 * (t95 - (cum - cnt)) / cnt, 4) END,
        |               CASE WHEN cum >= t95 THEN bin END) AS p95_est
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    // count-min sketch top-k: the md5-derived (row, bucket) hashing
    // and the integer bucket counts replay exactly, so even the
    // collision-inflated estimates hash-match
    // count-min sketch top-k: the md5-derived (row, bucket) hashing
    // and the integer bucket counts replay exactly, so even the
    // collision-inflated estimates hash-match
    "sketch_cms_topk" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |dd AS (SELECT unnest(range(4)) AS d),
        |st AS (SELECT dd.d,
        |              CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR)
        |                  || '|' || toks.tok), 1, 15) AS BIGINT) % 1024
        |                AS bucket,
        |              CAST(count(*) AS BIGINT) AS cnt
        |       FROM toks, dd GROUP BY 1, 2),
        |v AS (SELECT DISTINCT tok FROM toks),
        |pr AS (SELECT v.tok, dd.d,
        |              CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR)
        |                  || '|' || v.tok), 1, 15) AS BIGINT) % 1024
        |                AS bucket
        |       FROM v, dd),
        |est AS (SELECT pr.tok, min(st.cnt) AS est
        |        FROM pr JOIN st ON pr.d = st.d AND pr.bucket = st.bucket
        |        GROUP BY 1)
        |SELECT tok, est FROM est
        |ORDER BY est DESC, tok LIMIT 15""".stripMargin,
    // grouped CMS: one sketch per language, same md5 hashing
    // grouped CMS: one sketch per language, same md5 hashing
    "sketch_cms_grouped" ->
      """WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |dd AS (SELECT unnest(range(4)) AS d),
        |st AS (SELECT toks.lang, dd.d,
        |              CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR)
        |                  || '|' || toks.tok), 1, 15) AS BIGINT) % 1024
        |                AS bucket,
        |              CAST(count(*) AS BIGINT) AS cnt
        |       FROM toks, dd GROUP BY 1, 2, 3),
        |v AS (SELECT DISTINCT lang, tok FROM toks),
        |pr AS (SELECT v.lang, v.tok, dd.d,
        |              CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR)
        |                  || '|' || v.tok), 1, 15) AS BIGINT) % 1024
        |                AS bucket
        |       FROM v, dd),
        |est AS (SELECT pr.lang, pr.tok, min(st.cnt) AS est
        |        FROM pr JOIN st ON pr.lang = st.lang AND pr.d = st.d
        |          AND pr.bucket = st.bucket
        |        GROUP BY 1, 2),
        |r AS (SELECT lang, tok, est, row_number() OVER (
        |        PARTITION BY lang ORDER BY est DESC, tok) AS rk
        |      FROM est)
        |SELECT lang, rk, tok, est FROM r WHERE rk <= 5
        |ORDER BY lang, rk""".stripMargin,
    // kNN majority-vote classifier: top-5 cosine neighbors (rank ties
    // by id, the repo-wide discipline), votes counted per label,
    // winner = max votes with smaller-label tiebreak
    // kNN regression: mean of 5 neighbor labels (integer-exact) and
    // the (rounded-score + 1)-weighted mean
    // KMV rollup: per-group rows as in sketch_kmv_distinct, plus a
    // '__all__' row whose estimate comes from the k smallest of the
    // UNION of per-group k-min sets — which equals the k smallest
    // global distinct hashes (the mergeability property), so the
    // mirror computes it directly from the global distinct set
    // KMV set operations: per-group k-min sets → pairwise union /
    // Jaccard / intersection estimates, all pure md5+integer-derived
    // (the union's k-min IS the true k-min of A∪B; Broder resemblance
    // on it; intersection = J·U) — mirrored list-for-list
    "sketch_kmv_setops" ->
      """WITH h AS (SELECT DISTINCT event_type AS grp,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events WHERE value > 200),
        |r AS (SELECT grp, h,
        |             row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        |      FROM h),
        |s AS (SELECT grp, CAST(count(*) AS BIGINT) AS nd,
        |             max(CASE WHEN rn = 64 THEN h END) AS kth,
        |             list_sort(list(h) FILTER (WHERE rn <= 64)) AS mins
        |      FROM r GROUP BY grp),
        |p AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
        |             a.nd AS nd_a, a.kth AS kth_a, a.mins AS ma,
        |             b.nd AS nd_b, b.kth AS kth_b, b.mins AS mb
        |      FROM s a JOIN s b ON a.grp < b.grp),
        |c AS (SELECT *,
        |        list_sort(list_distinct(list_concat(ma, mb))) AS uni,
        |        list_intersect(ma, mb) AS inter
        |      FROM p),
        |d AS (SELECT *, least(64, len(uni)) AS m,
        |        len(list_intersect(uni[1:64], inter)) AS jnum
        |      FROM c),
        |e AS (SELECT *,
        |        CASE WHEN len(uni) < 64 THEN CAST(len(uni) AS DOUBLE)
        |             ELSE (CAST(63.0 AS DOUBLE)
        |                     * CAST(1152921504606846976 AS DOUBLE))
        |                  / CAST(list_extract(uni, m) AS DOUBLE) END AS u_est,
        |        CAST(jnum AS DOUBLE) / CAST(m AS DOUBLE) AS j_est
        |      FROM d)
        |SELECT grp_a, grp_b,
        |       CASE WHEN nd_a < 64 THEN round(CAST(nd_a AS DOUBLE), 4)
        |            ELSE round((CAST(63.0 AS DOUBLE)
        |                          * CAST(1152921504606846976 AS DOUBLE))
        |                       / CAST(kth_a AS DOUBLE), 4) END AS est_a,
        |       CASE WHEN nd_b < 64 THEN round(CAST(nd_b AS DOUBLE), 4)
        |            ELSE round((CAST(63.0 AS DOUBLE)
        |                          * CAST(1152921504606846976 AS DOUBLE))
        |                       / CAST(kth_b AS DOUBLE), 4) END AS est_b,
        |       round(u_est, 4) AS est_union,
        |       round(j_est, 4) AS jaccard_est,
        |       round(j_est * u_est, 4) AS est_inter
        |FROM e ORDER BY grp_a, grp_b""".stripMargin,
    "sketch_kmv_rollup" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h,
        |             row_number() OVER (PARTITION BY event_type ORDER BY h)
        |               AS rn
        |      FROM h),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
        |             max(CASE WHEN rn = 64 THEN h END) AS kth
        |      FROM r GROUP BY event_type),
        |per AS (SELECT event_type AS grp, least(nd, 64) AS n_seen,
        |          CASE WHEN nd < 64 THEN round(CAST(nd AS DOUBLE), 4)
        |               ELSE round((CAST(63.0 AS DOUBLE)
        |                             * CAST(1152921504606846976 AS DOUBLE))
        |                          / CAST(kth AS DOUBLE), 4) END
        |            AS est_distinct
        |        FROM s),
        |gh AS (SELECT DISTINCT h FROM h),
        |gr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM gh),
        |gs AS (SELECT CAST(count(*) AS BIGINT) AS n_seen,
        |              max(CASE WHEN rn = 64 THEN h END) AS kth
        |       FROM gr WHERE rn <= 64),
        |gl AS (SELECT '__all__' AS grp, n_seen,
        |         CASE WHEN n_seen < 64 THEN round(CAST(n_seen AS DOUBLE), 4)
        |              ELSE round((CAST(63.0 AS DOUBLE)
        |                            * CAST(1152921504606846976 AS DOUBLE))
        |                         / CAST(kth AS DOUBLE), 4) END
        |           AS est_distinct
        |       FROM gs)
        |SELECT grp, n_seen, est_distinct FROM per
        |UNION ALL SELECT grp, n_seen, est_distinct FROM gl
        |ORDER BY grp""".stripMargin,
    // chunk_id ≡ start_tok / stride (posexplode numbers the sequence
    // 0, stride, 2·stride… in order), so the oracle derives it
    // arithmetically; DuckDB list slicing clamps at the list end the
    // same way Spark's slice(length=32) does for the short final
    // window
    // n-gram coverage of eval by train (doc_id%10 8/2 split): per n,
    // distinct + occurrence-weighted coverage via one gram-keyed
    // left join per n against the train distinct set
    "corpus_ngram_coverage" -> {
      def block(n: Int, gramList: String) =
        s"""g$n AS (SELECT (doc_id % 10 < 8) AS is_train, g
           |       FROM (SELECT doc_id, ws FROM w WHERE len(ws) >= $n),
           |            unnest($gramList) AS t(g)),
           |tr$n AS (SELECT DISTINCT g FROM g$n WHERE is_train),
           |ev$n AS (SELECT g, CAST(count(*) AS BIGINT) AS occ
           |        FROM g$n WHERE NOT is_train GROUP BY 1),
           |s$n AS (SELECT CAST($n AS BIGINT) AS n,
           |         CAST(count(*) AS BIGINT) AS eval_distinct,
           |         CAST(sum(CASE WHEN tr$n.g IS NOT NULL THEN 1
           |           ELSE 0 END) AS BIGINT) AS covered_distinct,
           |         CAST(sum(ev$n.occ) AS BIGINT) AS eval_occ,
           |         CAST(sum(CASE WHEN tr$n.g IS NOT NULL THEN ev$n.occ
           |           ELSE 0 END) AS BIGINT) AS covered_occ
           |       FROM ev$n LEFT JOIN tr$n ON ev$n.g = tr$n.g)""".stripMargin
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |           FROM documents),
         |${block(1, "ws")},
         |${block(2, "list_transform(range(1, len(ws)), " +
            "i -> ws[i] || ' ' || ws[i+1])")},
         |${block(3, "list_transform(range(1, len(ws) - 1), " +
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])")},
         |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2
         |      UNION ALL SELECT * FROM s3)
         |SELECT n, eval_distinct, covered_distinct,
         |       round(CAST(covered_distinct AS DOUBLE) / eval_distinct,
         |         6) AS distinct_coverage,
         |       eval_occ, covered_occ,
         |       round(CAST(covered_occ AS DOUBLE) / eval_occ, 6)
         |         AS occ_coverage
         |FROM u ORDER BY n""".stripMargin
    },
    // RAKE: phrase id = running stopword count; word score =
    // truncating (deg·10⁴)//freq fixed-point so phrase scores and
    // the top-k rank are all-integer; phrase string reassembled in
    // position order on both engines
    // Simpson diversity of language mix per source: the HHI integer
    // arithmetic (squares via HUGEINT) pointed at corpus composition
    "corpus_source_diversity" ->
      """WITH g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
        |       CAST(sum(n) AS BIGINT) AS n_docs,
        |       round(1.0 - CAST(sum(CAST(n AS HUGEINT) * n) AS DOUBLE)
        |         / CAST(CAST(sum(n) AS HUGEINT) * sum(n) AS DOUBLE), 6)
        |         AS simpson
        |FROM g GROUP BY 1 ORDER BY source""".stripMargin,
    // interarrival gaps per segment: lag over per-customer date
    // order, exact interpolated percentiles
    // Zipf OLS from micro-unit-quantized logs summed as exact longs
    "corpus_zipf_fit" ->
      """WITH c AS (SELECT t, CAST(count(*) AS BIGINT) AS n
        |           FROM (SELECT unnest(string_split(text, ' ')) AS t
        |                 FROM documents) GROUP BY t),
        |top AS (SELECT n, row_number() OVER (ORDER BY n DESC, t) AS r
        |        FROM c ORDER BY n DESC, t LIMIT 100),
        |u AS (SELECT CAST(round(ln(r) * 1000000) AS BIGINT) AS x,
        |             CAST(round(ln(n) * 1000000) AS BIGINT) AS y
        |      FROM top),
        |sagg AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(x) AS sx,
        |                sum(y) AS sy, sum(x * y) AS sxy,
        |                sum(x * x) AS sxx, sum(y * y) AS syy
        |         FROM u)
        |SELECT k AS n_terms,
        |  round((k * sxy - sx * sy) * 1.0 / (k * sxx - sx * sx), 4)
        |    AS slope,
        |  round((sy * 1.0 / k - ((k * sxy - sx * sy) * 1.0
        |    / (k * sxx - sx * sx)) * sx / k) / 1000000.0, 4)
        |    AS intercept,
        |  round(((k * sxy - sx * sy) * 1.0 * (k * sxy - sx * sy))
        |    / ((k * sxx - sx * sx) * 1.0 * (k * syy - sy * sy)), 4)
        |    AS r2
        |FROM sagg""".stripMargin,
    // SymSpell deletion blocking + exact levenshtein verify
    // CCNet head/middle/tail: every doc scored under the train-split
    // backoff model, exact p33/p66 cuts per language, volumes + share
    "corpus_ccnet_buckets" ->
      """WITH pd AS (SELECT doc_id, lang,
        |        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |               >= 'cccd' AND doc_id % 3 = 0
        |             THEN text || ' zzqx7 table' ELSE text END AS text
        |      FROM documents),
        |w AS (SELECT doc_id, lang,
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
        |          AS is_train,
        |        string_split(text, ' ') AS ws
        |      FROM pd),
        |bg AS (SELECT doc_id, lang, is_train, ws[i] AS a, ws[i + 1] AS b
        |       FROM w, unnest(range(1, len(ws))) AS t(i)),
        |cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cab
        |        FROM bg WHERE is_train GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca
        |       FROM cab GROUP BY 1),
        |cb AS (SELECT b, CAST(sum(cab) AS BIGINT) AS cb
        |       FROM cab GROUP BY 1),
        |nt AS (SELECT CAST(sum(cab) AS BIGINT) AS nn FROM cab),
        |tf AS (SELECT doc_id, lang, a, b, CAST(count(*) AS BIGINT) AS tf
        |       FROM bg GROUP BY 1, 2, 3, 4),
        |sc AS (SELECT tf.doc_id, tf.lang, tf.tf,
        |         CASE WHEN cab.cab IS NOT NULL
        |              THEN CAST(length(bin(ca.ca // cab.cab)) - 1
        |                     AS BIGINT)
        |              WHEN cb.cb IS NOT NULL
        |              THEN CAST(length(bin((5 * nt.nn) // (2 * cb.cb)))
        |                     - 1 AS BIGINT)
        |              ELSE 40 END AS bits
        |       FROM tf
        |       LEFT JOIN cab ON tf.a = cab.a AND tf.b = cab.b
        |       LEFT JOIN ca ON tf.a = ca.a
        |       LEFT JOIN cb ON tf.b = cb.b
        |       CROSS JOIN nt),
        |per AS (SELECT doc_id, lang, CAST(sum(tf) AS BIGINT) AS nb,
        |         CAST(sum(tf * bits) AS BIGINT) AS tb,
        |         CAST(sum(tf * bits) AS BIGINT) * 1.0
        |           / CAST(sum(tf) AS BIGINT) AS bpb
        |        FROM sc GROUP BY 1, 2),
        |th AS (SELECT lang,
        |        quantile_cont(bpb, CAST(1 AS DOUBLE) / 3) AS p33,
        |        quantile_cont(bpb, CAST(2 AS DOUBLE) / 3) AS p66
        |       FROM per GROUP BY 1),
        |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
        |        FROM per GROUP BY 1),
        |bk AS (SELECT per.lang,
        |        CASE WHEN per.bpb <= th.p33 THEN 'head'
        |             WHEN per.bpb <= th.p66 THEN 'middle'
        |             ELSE 'tail' END AS bucket,
        |        per.nb
        |       FROM per JOIN th USING (lang))
        |SELECT bk.lang, bk.bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(bk.nb) AS BIGINT) AS n_bigrams,
        |  round(CAST(count(*) AS BIGINT) * 1.0 / tot.nl, 4) AS doc_share
        |FROM bk JOIN tot USING (lang)
        |GROUP BY bk.lang, bk.bucket, tot.nl
        |ORDER BY lang, bucket""".stripMargin,
    // held-out cross-entropy with stupid backoff: train-split bigram
    // model, integer floor-log2 bits (seen / backoff / 40-bit OOV
    // sentinel), exact BIGINT sums, one final division
    // dataset card: 1-row composition of proven aggregates (size,
    // exact-dup share, near-dup pairs, both gates' keep rates)
    "corpus_dataset_card" ->
      s"""WITH $bandCte,
         |$verifiedPairsCte,
         |ndp AS (SELECT CAST(count(*) AS BIGINT) AS near_dup_pairs
         |        FROM pairs),
         |bs AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         |           AS n_tokens,
         |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |         CAST(count(DISTINCT text) AS BIGINT) AS n_distinct
         |       FROM documents),
         |kqt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |        FROM documents),
         |kqtf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |         FROM kqt GROUP BY 1, 2),
         |kqf AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
         |          CAST(count(*) AS BIGINT) AS n_distinct,
         |          CAST(max(tf) AS BIGINT) AS max_tf,
         |          CAST(sum(CASE WHEN tok IN
         |              ('the','a','and','of','to','in','is')
         |            THEN tf ELSE 0 END) AS BIGINT) AS stop_hits
         |        FROM kqtf GROUP BY 1),
         |kqg AS (SELECT
         |          (3 * least((n_toks * 10000) // 100, 10000)
         |            + 3 * ((n_distinct * 10000) // n_toks)
         |            + 2 * ((stop_hits * 10000) // n_toks)
         |            - 4 * ((max_tf * 10000) // n_toks)) >= 28000
         |            AS keep_m,
         |          round((least(n_toks/50.0, 1.0)
         |            + CASE WHEN stop_hits*1.0/n_toks
         |                BETWEEN 0.01 AND 0.6
         |                THEN 1.0 ELSE 0.0 END
         |            + (1.0 - least((1.0 - n_distinct*1.0/n_toks)/0.9,
         |                1.0))) / 3.0, 4) >= 0.5 AS keep_h
         |        FROM kqf),
         |kr AS (SELECT
         |         round(CAST(sum(CASE WHEN keep_m THEN 1 ELSE 0 END)
         |             AS DOUBLE) / count(*), 4) AS keep_rate_model,
         |         round(CAST(sum(CASE WHEN keep_h THEN 1 ELSE 0 END)
         |             AS DOUBLE) / count(*), 4) AS keep_rate_heuristic
         |       FROM kqg)
         |SELECT bs.n_docs, bs.n_tokens, bs.n_langs, bs.n_sources,
         |       round(CAST(1.0 AS DOUBLE)
         |         - CAST(bs.n_distinct AS DOUBLE) / bs.n_docs, 4)
         |         AS exact_dup_share,
         |       ndp.near_dup_pairs, kr.keep_rate_model,
         |       kr.keep_rate_heuristic
         |FROM bs CROSS JOIN ndp CROSS JOIN kr""".stripMargin,
    // Cohen's kappa between the model gate and the heuristic gate,
    // both gates off the one tf aggregate; pe=1 degenerates to NULL,
  )
}
