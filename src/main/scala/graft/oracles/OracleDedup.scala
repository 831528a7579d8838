package graft

/** Dedup-family oracle SQL — split verbatim from SparkEntry
  * (r12, r11 verdict #7). The registry stays in SparkEntry;
  * these maps are its DuckDB mirrors, byte-identical to the
  * pre-split strings.
  */
private[graft] object OracleDedup {
  import OracleCtes._

  val sql: Map[String, String] = Map(
    // SemDeDup: the ann_ivf training chain (same stride-200 seeds,
    // same two Lloyd rounds, same 6dp/FLOAT mean round-trip) gives
    // the final assignment af; pairs ONLY within a cell, drop id2
    // when a lower-id neighbor clears the bar, keeper = (s DESC,
    // id ASC) first among qualifying partners
    "dedup_semdedup" ->
      ("WITH " + Seq(
        "e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
        "c0 AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id % 200 = 0)",
        ivfAssignCte("a1", "c0"),
        ivfMeanCte("c1", "a1"),
        ivfAssignCte("a2", "c1"),
        ivfMeanCte("c2", "a2"),
        ivfAssignCte("af", "c2")).mkString(",\n") + """,
        |p AS (SELECT a.cell, a.id, b.id AS id2,
        |        list_cosine_similarity(a.v, b.v) AS s
        |      FROM af a JOIN af b
        |        ON a.cell = b.cell AND a.id < b.id),
        |r AS (SELECT id2 AS doc_id, cell, id AS keeper, s,
        |        row_number() OVER (PARTITION BY id2
        |          ORDER BY s DESC, id) AS rk
        |      FROM p WHERE s >= 0.35)
        |SELECT doc_id, cell, keeper, round(s, 4) AS cosine
        |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin),
    // keeper-chain closure: the same drop table, then a recursive
    // walk (keeper ids strictly decrease, so the recursion is
    // acyclic) — final depth per dropped doc = chain length to its
    // surviving ancestor; depth 0 row carries the survivor count
    "dedup_semdedup_closure" ->
      ("WITH RECURSIVE " + Seq(
        "e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
        "c0 AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id % 200 = 0)",
        ivfAssignCte("a1", "c0"),
        ivfMeanCte("c1", "a1"),
        ivfAssignCte("a2", "c1"),
        ivfMeanCte("c2", "a2"),
        ivfAssignCte("af", "c2")).mkString(",\n") + """,
        |p AS (SELECT a.cell, a.id, b.id AS id2,
        |        list_cosine_similarity(a.v, b.v) AS s
        |      FROM af a JOIN af b
        |        ON a.cell = b.cell AND a.id < b.id),
        |r AS (SELECT id2 AS doc_id, id AS keeper,
        |        row_number() OVER (PARTITION BY id2
        |          ORDER BY s DESC, id) AS rk
        |      FROM p WHERE s >= 0.35),
        |d AS (SELECT doc_id, keeper FROM r WHERE rk = 1),
        |chain AS (
        |  SELECT doc_id, keeper, 1 AS depth FROM d
        |  UNION ALL
        |  SELECT c.doc_id, d2.keeper, c.depth + 1
        |  FROM chain c JOIN d d2 ON c.keeper = d2.doc_id),
        |fin AS (SELECT doc_id, max(depth) AS depth
        |        FROM chain GROUP BY doc_id),
        |hist AS (SELECT CAST(depth AS BIGINT) AS depth,
        |           CAST(count(*) AS BIGINT) AS n_docs
        |         FROM fin GROUP BY 1),
        |surv AS (SELECT CAST(0 AS BIGINT) AS depth,
        |           (SELECT count(*) FROM embeddings)
        |             - (SELECT count(*) FROM d) AS n_docs)
        |SELECT depth, n_docs FROM (SELECT * FROM surv
        |  UNION ALL SELECT * FROM hist) ORDER BY depth""".stripMargin),
    // incremental SemDeDup: batch (%11, +100000) assigned under the
    // FROZEN c2 centroids; drop vs ALL same-cell corpus members and
    // vs earlier-in-batch; keeper = (s DESC, id ASC) first
    "dedup_semdedup_incremental" ->
      ("WITH " + Seq(
        "e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
        "c0 AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id % 200 = 0)",
        ivfAssignCte("a1", "c0"),
        ivfMeanCte("c1", "a1"),
        ivfAssignCte("a2", "c1"),
        ivfMeanCte("c2", "a2"),
        ivfAssignCte("af", "c2"),
        "bb AS (SELECT vec_id + 100000 AS id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 11 = 0)",
        s"ab AS (SELECT id, v, cell FROM (SELECT b.id, b.v, c.cell, " +
          s"row_number() OVER (PARTITION BY b.id ORDER BY ${ivfCd("b.v", "c.cv")}, c.cell) AS rn " +
          s"FROM bb b CROSS JOIN c2 c) WHERE rn = 1)").mkString(",\n") + """,
        |pc AS (SELECT ab.id, ab.cell, a.id AS partner,
        |         list_cosine_similarity(ab.v, a.v) AS s
        |       FROM ab JOIN af a ON ab.cell = a.cell),
        |pb AS (SELECT b2.id, b2.cell, b1.id AS partner,
        |         list_cosine_similarity(b2.v, b1.v) AS s
        |       FROM ab b2 JOIN ab b1
        |         ON b2.cell = b1.cell AND b1.id < b2.id),
        |p AS (SELECT * FROM pc UNION ALL SELECT * FROM pb),
        |r AS (SELECT id AS doc_id, cell, partner AS keeper, s,
        |        row_number() OVER (PARTITION BY id
        |          ORDER BY s DESC, partner) AS rk
        |      FROM p WHERE s >= 0.35)
        |SELECT doc_id, cell, keeper, round(s, 4) AS cosine
        |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin),
    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT md5(text) AS fp, CAST(count(*) AS BIGINT) AS n_copies,
        |       min(doc_id) AS canonical_id
        |FROM corpus GROUP BY 1 HAVING count(*) > 1
        |ORDER BY canonical_id""".stripMargin,
    "dedup_minhash_sig" ->
      s"""WITH $bandCte
         |SELECT doc_id, band, band_key FROM bk ORDER BY doc_id, band"""
        .stripMargin,
    "dedup_minhash_pairs" ->
      s"""WITH $bandCte,
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bk a JOIN bk b ON a.band = b.band
         |           AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |$jaccardVerify""".stripMargin,
    // edit-distance re-score of the verified pair set: Levenshtein
    // over the pair texts, similarity as the exact integer half-up
    // of (maxlen - lev)/maxlen at 4dp
    "dedup_edit_distance" ->
      s"""WITH $bandCte,
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bk a JOIN bk b ON a.band = b.band
         |           AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS n
         |          FROM shx x JOIN shx y ON x.s = y.s AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |prs AS (SELECT c.id1, c.id2,
         |          round(n*1.0/(c1.c + c2.c - n), 4) AS jaccard
         |        FROM cand c JOIN inter i ON c.id1 = i.id1 AND c.id2 = i.id2
         |        JOIN card c1 ON c.id1 = c1.doc_id
         |        JOIN card c2 ON c.id2 = c2.doc_id
         |        WHERE n*1.0/(c1.c + c2.c - n) >= 0.5),
         |ed AS (SELECT p.id1, p.id2, p.jaccard,
         |         CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS lev,
         |         CAST(greatest(length(ta.text), length(tb.text))
         |           AS BIGINT) AS ml
         |       FROM prs p JOIN documents ta ON p.id1 = ta.doc_id
         |       JOIN documents tb ON p.id2 = tb.doc_id)
         |SELECT id1, id2, jaccard, lev,
         |  (((ml - lev) * 20000 + ml) // (ml * 2)) / 10000.0 AS edit_sim
         |FROM ed WHERE ml > 0 ORDER BY id1, id2""".stripMargin,
    // cross-modal audit: minhash pairs -> embedding cosine, means
    // over micro-quantized ints, one-row agreement report
    "dedup_text_vs_embed" ->
      s"""WITH $bandCte,
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bk a JOIN bk b ON a.band = b.band
         |           AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2,
         |            count(*) AS n
         |          FROM shx x JOIN shx y ON x.s = y.s
         |            AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |prs AS (SELECT c.id1, c.id2,
         |          round(n*1.0/(c1.c + c2.c - n), 4) AS jaccard
         |        FROM cand c JOIN inter i ON c.id1 = i.id1
         |          AND c.id2 = i.id2
         |        JOIN card c1 ON c.id1 = c1.doc_id
         |        JOIN card c2 ON c.id2 = c2.doc_id
         |        WHERE n*1.0/(c1.c + c2.c - n) >= 0.5),
         |wcx AS (SELECT prs.jaccard,
         |          round(list_cosine_similarity(ea.embedding::DOUBLE[],
         |            eb.embedding::DOUBLE[]), 4) AS cos
         |        FROM prs JOIN embeddings ea ON prs.id1 = ea.vec_id
         |        JOIN embeddings eb ON prs.id2 = eb.vec_id
         |        WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
         |          eb.embedding::DOUBLE[]) IS NOT NULL)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |       round(CAST(sum(CAST(round(jaccard * 10000) AS BIGINT))
         |           AS DOUBLE) / count(*) / 10000.0, 4) AS mean_jaccard,
         |       round(CAST(sum(CAST(round(cos * 10000) AS BIGINT))
         |           AS DOUBLE) / count(*) / 10000.0, 4) AS mean_cos,
         |       CAST(sum(CASE WHEN cos >= 0.8 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_cos80,
         |       round(CAST(sum(CASE WHEN cos >= 0.8 THEN 1 ELSE 0 END)
         |           AS DOUBLE) / count(*), 4) AS agree80_rate
         |FROM wcx""".stripMargin,
    // winnowing (MOSS): char-5-gram 60-bit hashes, window-of-4 min
    // selection via the offset explode, pairs on df-in-[2,8]
    // fingerprints — every stage integer-exact
    // winnowing (MOSS): char-5-gram 60-bit hashes, window-of-4 min
    // selection via the offset explode, pairs on df-in-[2,8]
    // fingerprints — every stage integer-exact
    "dedup_winnowing" ->
      s"""WITH ${winnowCtes("documents", "")},
        |dfc AS (SELECT fp FROM fps GROUP BY fp
        |        HAVING count(*) BETWEEN 2 AND 8),
        |bl AS (SELECT f.doc_id, f.fp FROM fps f JOIN dfc USING (fp))
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM bl a JOIN bl b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id1, id2""".stripMargin,
    // incremental winnowing vs the persisted fingerprint index: the
    // definitional mirror recomputes both fingerprint sets; the df
    // guard counts CORPUS fingerprints among the batch's collisions
    // incremental winnowing vs the persisted fingerprint index: the
    // definitional mirror recomputes both fingerprint sets; the df
    // guard counts CORPUS fingerprints among the batch's collisions
    "dedup_winnow_incremental" ->
      s"""WITH ${winnowCtes("documents", "")},
        |${winnowCtes("(SELECT doc_id + 200000 AS doc_id, " +
           "text || ' zzyzx' AS text FROM documents " +
           "WHERE doc_id % 9 = 0)", "b")},
        |mfp AS (SELECT c.fp FROM fps c
        |        WHERE c.fp IN (SELECT fp FROM fpsb)
        |        GROUP BY c.fp HAVING count(*) <= 8)
        |SELECT b.doc_id AS id1, c.doc_id AS id2,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM fpsb b JOIN fps c ON b.fp = c.fp
        |JOIN mfp ON b.fp = mfp.fp
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id1, id2""".stripMargin,
    // containment: candidates block on shared RARE shingles (df in
    // [2, 8]); n/least and n/(c1+c2-n) are BIGINT-derived doubles,
    // identical IEEE on both engines; threshold compares unrounded
    // containment: candidates block on shared RARE shingles (df in
    // [2, 8]); n/least and n/(c1+c2-n) are BIGINT-derived doubles,
    // identical IEEE on both engines; threshold compares unrounded
    "dedup_containment" ->
      s"""WITH $shingleCte,
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |rare AS (SELECT s FROM shx GROUP BY s
         |         HAVING count(*) BETWEEN 2 AND 8),
         |cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |         FROM shx x JOIN shx y USING (s) JOIN rare USING (s)
         |         WHERE x.doc_id < y.doc_id),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2,
         |            CAST(count(*) AS BIGINT) AS n
         |          FROM shx x JOIN shx y
         |            ON x.s = y.s AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT c.id1 AS id1, c.id2 AS id2, i.n AS n_shared,
         |       round(i.n * 1.0 / least(c1.c, c2.c), 4) AS containment,
         |       round(i.n * 1.0 / (c1.c + c2.c - i.n), 4) AS jaccard
         |FROM cand c JOIN inter i ON c.id1 = i.id1 AND c.id2 = i.id2
         |JOIN card c1 ON c.id1 = c1.doc_id
         |JOIN card c2 ON c.id2 = c2.doc_id
         |WHERE i.n * 1.0 / least(c1.c, c2.c) >= 0.8
         |ORDER BY c.id1, c.id2""".stripMargin,
    // decontamination: split by the same md5 bucket rule as
    // corpus_sample_split (train < 'cccd' = 0.8), shared-shingle
    // counts against the EVAL side's shingle cardinality; n/c is
    // BIGINT/BIGINT → DOUBLE in both engines, identical IEEE result
    // decontamination: split by the same md5 bucket rule as
    // corpus_sample_split (train < 'cccd' = 0.8), shared-shingle
    // counts against the EVAL side's shingle cardinality; n/c is
    // BIGINT/BIGINT → DOUBLE in both engines, identical IEEE result
    "decontam_overlap" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
         |${shingleCteFrom("corpus")},
         |sp AS (SELECT doc_id,
         |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
         |                   < 'cccd'
         |              THEN 'train' ELSE 'eval' END AS split
         |       FROM corpus),
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |ts AS (SELECT shx.doc_id AS train_id, s
         |       FROM shx JOIN sp USING (doc_id) WHERE split = 'train'),
         |es AS (SELECT shx.doc_id AS eval_id, s
         |       FROM shx JOIN sp USING (doc_id) WHERE split = 'eval'),
         |ec AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS c
         |       FROM es GROUP BY 1),
         |inter AS (SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS n
         |          FROM ts JOIN es USING (s) GROUP BY 1, 2)
         |SELECT eval_id, train_id, n AS n_shared, round(n / c, 4) AS overlap
         |FROM inter JOIN ec USING (eval_id)
         |WHERE n / c >= 0.2 ORDER BY eval_id, train_id""".stripMargin,
    // hard-negative triplets: the near-miss pool = 16-bit simhash
    // band collisions with hamming > 1 (the dedup_simhash_pairs
    // pipeline with the bar inverted), minus the anchor's verified
    // minhash pairs; pick = same arg-min md5(anchor|cand)
    // shingle df histogram: integer CASE cuts; the 2-8 band is the
    // containment path's blocking-key supply
    "dedup_shingle_df_hist" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh),
         |df AS (SELECT sh AS shingle,
         |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |       FROM ex GROUP BY 1)
         |SELECT CASE WHEN df = 1 THEN '1_hapax'
         |            WHEN df <= 8 THEN '2-8_blocking_band'
         |            WHEN df <= 64 THEN '9-64_common'
         |            ELSE '65+_boilerplate' END AS df_bucket,
         |       CAST(count(*) AS BIGINT) AS n_shingles
         |FROM df GROUP BY 1 ORDER BY df_bucket""".stripMargin,
    // per-day share HALF-UP micro-quantized, then integer-moment OLS
    "dedup_simhash" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |             len(string_split(text, ' ')) AS nt FROM documents),
        |u AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) AS h
        |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)),
        |v AS (SELECT doc_id, bit,
        |        sum(CASE WHEN (h // (1 << bit)) % 2 = 1 THEN 1 ELSE -1 END) AS vote
        |      FROM u CROSS JOIN (SELECT unnest(range(16)) AS bit) GROUP BY 1, 2)
        |SELECT v.doc_id AS doc_id, CAST(nt AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN vote > 0 THEN 1 << bit ELSE 0 END) AS BIGINT)
        |         AS simhash16
        |FROM v JOIN t ON v.doc_id = t.doc_id GROUP BY v.doc_id, nt
        |ORDER BY doc_id""".stripMargin,
    "dedup_simhash_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) AS h
        |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)),
        |v AS (SELECT doc_id, bit,
        |        sum(CASE WHEN (h // (1 << bit)) % 2 = 1 THEN 1 ELSE -1 END) AS vote
        |      FROM u CROSS JOIN (SELECT unnest(range(16)) AS bit) GROUP BY 1, 2),
        |sg AS (SELECT doc_id,
        |         CAST(sum(CASE WHEN vote > 0 THEN 1 << bit ELSE 0 END)
        |           AS BIGINT) AS sh
        |       FROM v GROUP BY doc_id),
        |bands AS (SELECT doc_id, sh, 0 AS band, sh % 256 AS key FROM sg
        |          UNION ALL
        |          SELECT doc_id, sh, 1, sh // 256 FROM sg),
        |cand AS (SELECT DISTINCT
        |           least(a.doc_id, b.doc_id) AS id1,
        |           greatest(a.doc_id, b.doc_id) AS id2,
        |           CASE WHEN a.doc_id < b.doc_id THEN a.sh ELSE b.sh END AS h1,
        |           CASE WHEN a.doc_id < b.doc_id THEN b.sh ELSE a.sh END AS h2
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.key = b.key
        |             AND a.doc_id < b.doc_id)
        |SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(h1, h2)) <= 1
        |ORDER BY id1, id2""".stripMargin,
    // cluster_id = min doc_id reachable in the undirected verified-
    // pair graph; the linear-recursive CTE extends paths one edge per
    // step and the UNION dedups, so it reaches the same fixpoint as
    // the Spark side's min-label propagation
    // cluster_id = min doc_id reachable in the undirected verified-
    // pair graph; the linear-recursive CTE extends paths one edge per
    // step and the UNION dedups, so it reaches the same fixpoint as
    // the Spark side's min-label propagation
    "dedup_clusters" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte
         |SELECT id AS doc_id, min(r) AS cluster_id
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    // canonical selection: per cluster (singletons are their own
    // cluster) keep the max-quality member, ties to the lowest
    // doc_id; NULL-text quality ranks below every real score via the
    // same coalesce(q, -1) sentinel as the Spark side
    // canonical selection: per cluster (singletons are their own
    // cluster) keep the max-quality member, ties to the lowest
    // doc_id; NULL-text quality ranks below every real score via the
    // same coalesce(q, -1) sentinel as the Spark side
    "dedup_canonical" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte,
         |lab AS (SELECT id AS doc_id, min(r) AS cluster_id
         |        FROM reach GROUP BY id),
         |mem AS (SELECT d.doc_id,
         |          coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |        FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
         |tq AS (SELECT doc_id, string_split(text, ' ') AS toks
         |       FROM documents),
         |qm AS (SELECT doc_id, coalesce(round((
         |          least(len(toks)/50.0, 1.0)
         |          + CASE WHEN len(list_filter(toks,
         |              t -> t IN ('the','a','and','of','to','in','is')))
         |              *1.0/len(toks) BETWEEN 0.01 AND 0.6
         |            THEN 1.0 ELSE 0.0 END
         |          + (1.0 - least((1.0 - len(list_distinct(toks))
         |              *1.0/len(toks))/0.9, 1.0))) / 3.0, 4), -1.0) AS q
         |       FROM tq),
         |rep AS (SELECT m.cluster_id, m.doc_id,
         |          row_number() OVER (PARTITION BY m.cluster_id
         |            ORDER BY qm.q DESC, m.doc_id) AS rn
         |        FROM mem m JOIN qm ON m.doc_id = qm.doc_id),
         |can AS (SELECT cluster_id, doc_id AS canonical_id
         |        FROM rep WHERE rn = 1)
         |SELECT m.doc_id, m.cluster_id, c.canonical_id,
         |       (m.doc_id = c.canonical_id) AS is_kept
         |FROM mem m JOIN can c ON m.cluster_id = c.cluster_id
         |ORDER BY m.doc_id""".stripMargin,
    // impact rollup over the same canonical chain: per-source
    // before/after doc+token accounting, exact integers + two 6dp
    // keep-rate divisions
    // impact rollup over the same canonical chain: per-source
    // before/after doc+token accounting, exact integers + two 6dp
    // keep-rate divisions
    "dedup_impact_report" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte,
         |lab AS (SELECT id AS doc_id, min(r) AS cluster_id
         |        FROM reach GROUP BY id),
         |mem AS (SELECT d.doc_id,
         |          coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |        FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
         |tq AS (SELECT doc_id, string_split(text, ' ') AS toks
         |       FROM documents),
         |qm AS (SELECT doc_id, coalesce(round((
         |          least(len(toks)/50.0, 1.0)
         |          + CASE WHEN len(list_filter(toks,
         |              t -> t IN ('the','a','and','of','to','in','is')))
         |              *1.0/len(toks) BETWEEN 0.01 AND 0.6
         |            THEN 1.0 ELSE 0.0 END
         |          + (1.0 - least((1.0 - len(list_distinct(toks))
         |              *1.0/len(toks))/0.9, 1.0))) / 3.0, 4), -1.0) AS q
         |       FROM tq),
         |rep AS (SELECT m.cluster_id, m.doc_id,
         |          row_number() OVER (PARTITION BY m.cluster_id
         |            ORDER BY qm.q DESC, m.doc_id) AS rn
         |        FROM mem m JOIN qm ON m.doc_id = qm.doc_id),
         |can AS (SELECT cluster_id, doc_id AS canonical_id
         |        FROM rep WHERE rn = 1),
         |kept AS (SELECT m.doc_id,
         |           (m.doc_id = c.canonical_id) AS is_kept
         |         FROM mem m JOIN can c ON m.cluster_id = c.cluster_id),
         |sz AS (SELECT d.doc_id, d.source,
         |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
         |         k.is_kept
         |       FROM documents d JOIN kept k ON d.doc_id = k.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS docs_before,
         |       CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT)
         |         AS docs_kept,
         |       CAST(sum(n_tok) AS BIGINT) AS tokens_before,
         |       CAST(sum(CASE WHEN is_kept THEN n_tok ELSE 0 END)
         |         AS BIGINT) AS tokens_kept,
         |       round(CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END)
         |         AS DOUBLE) / count(*), 6) AS doc_keep_rate,
         |       round(CAST(sum(CASE WHEN is_kept THEN n_tok ELSE 0 END)
         |         AS DOUBLE) / sum(n_tok), 6) AS token_keep_rate
         |FROM sz GROUP BY source ORDER BY source""".stripMargin,
    // jaccard-decile histogram over the verified pair set: banding on
    // the identically-rounded 4dp jaccard (floor(j·10) runs on the
    // same double both engines), min/max per band exact
    // jaccard-decile histogram over the verified pair set: banding on
    // the identically-rounded 4dp jaccard (floor(j·10) runs on the
    // same double both engines), min/max per band exact
    "dedup_jaccard_hist" ->
      s"""WITH $bandCte,
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bk a JOIN bk b ON a.band = b.band
         |           AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS n
         |          FROM shx x JOIN shx y ON x.s = y.s
         |            AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |jp AS (SELECT c.id1, c.id2,
         |         round(n*1.0/(c1.c + c2.c - n), 4) AS j
         |       FROM cand c JOIN inter i ON c.id1 = i.id1 AND c.id2 = i.id2
         |       JOIN card c1 ON c.id1 = c1.doc_id
         |       JOIN card c2 ON c.id2 = c2.doc_id
         |       WHERE n*1.0/(c1.c + c2.c - n) >= 0.5),
         |bins AS (SELECT least(CAST(floor(j * 10) AS BIGINT), 9) AS b, j
         |         FROM jp)
         |SELECT b / 10.0 AS bin_lo, CAST(count(*) AS BIGINT) AS n_pairs,
         |       min(j) AS min_j, max(j) AS max_j
         |FROM bins GROUP BY 1 ORDER BY bin_lo""".stripMargin,
    // LSH S-curve: measured capture per jaccard decile + the
    // multiplication-only theoretical 1-(1-s^3)^4 at decile midpoints
    // LSH S-curve: measured capture per jaccard decile + the
    // multiplication-only theoretical 1-(1-s^3)^4 at decile midpoints
    "dedup_lsh_scurve" ->
      s"""WITH $bandCte,
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2,
         |            count(*) AS n
         |          FROM shx x JOIN shx y ON x.s = y.s
         |            AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |jp AS (SELECT i.id1, i.id2,
         |         least(CAST(floor((n*1.0/(c1.c + c2.c - n)) * 10)
         |           AS BIGINT), 9) AS b
         |       FROM inter i
         |       JOIN card c1 ON i.id1 = c1.doc_id
         |       JOIN card c2 ON i.id2 = c2.doc_id),
         |cd AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |       FROM bk a JOIN bk b ON a.band = b.band
         |         AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |fl AS (SELECT jp.b,
         |        CASE WHEN cd.id1 IS NOT NULL THEN 1 ELSE 0 END AS hit
         |       FROM jp LEFT JOIN cd
         |         ON jp.id1 = cd.id1 AND jp.id2 = cd.id2),
         |g AS (SELECT b, CAST(count(*) AS BIGINT) AS n_true,
         |        CAST(sum(hit) AS BIGINT) AS n_hit
         |      FROM fl GROUP BY 1),
         |t0 AS (SELECT *, (b * 2 + 1) / 20.0 AS sm FROM g),
         |t1 AS (SELECT *, 1.0 - sm * sm * sm AS u FROM t0)
         |SELECT b AS decile, n_true, n_hit,
         |  round(n_hit * 1.0 / n_true, 4) AS capture_rate,
         |  round(1.0 - (u * u) * (u * u), 4) AS theory_rate
         |FROM t1 ORDER BY decile""".stripMargin,
    // band-recall audit: TRUE pairs from the shingle-intersection
    // join at the exact jaccard bar, candidates from the band
    // buckets; one summary row of exact counts
    // band-recall audit: TRUE pairs from the shingle-intersection
    // join at the exact jaccard bar, candidates from the band
    // buckets; one summary row of exact counts
    "dedup_band_recall" ->
      s"""WITH $bandCte,
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2,
         |            count(*) AS n
         |          FROM shx x JOIN shx y ON x.s = y.s
         |            AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |tp AS (SELECT i.id1, i.id2 FROM inter i
         |       JOIN card c1 ON i.id1 = c1.doc_id
         |       JOIN card c2 ON i.id2 = c2.doc_id
         |       WHERE n*1.0/(c1.c + c2.c - n) >= 0.5),
         |cd AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |       FROM bk a JOIN bk b ON a.band = b.band
         |         AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |h AS (SELECT tp.id1 FROM tp
         |      JOIN cd ON tp.id1 = cd.id1 AND tp.id2 = cd.id2)
         |SELECT CAST((SELECT count(*) FROM tp) AS BIGINT) AS n_true,
         |       CAST((SELECT count(*) FROM cd) AS BIGINT) AS n_cand,
         |       CAST((SELECT count(*) FROM h) AS BIGINT) AS n_hit,
         |       round((SELECT count(*) FROM h) * 1.0
         |         / (SELECT count(*) FROM tp), 4) AS recall""".stripMargin,
    // Heaps-law vocabulary growth: docs cut into rank deciles, each
    // word charged to its FIRST doc's decile, cumulative vocabulary
    // cross-source near-dup overlap: verified pairs joined to each
    // side's source, counted per unordered source pair
    "dedup_source_overlap" ->
      s"""WITH $bandCte,
         |$verifiedPairsCte,
         |ds AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS source_a,
         |       greatest(a.source, b.source) AS source_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pairs p JOIN ds a ON p.id1 = a.doc_id
         |     JOIN ds b ON p.id2 = b.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // cluster-size histogram — the "how much duplicate mass" number:
    // components → per-cluster member counts → count-of-counts
    // cluster-size histogram — the "how much duplicate mass" number:
    // components → per-cluster member counts → count-of-counts
    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte,
         |lab AS (SELECT id AS doc_id, min(r) AS cluster_id
         |        FROM reach GROUP BY id),
         |cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
         |       FROM lab GROUP BY 1)
         |SELECT sz AS cluster_size,
         |       CAST(count(*) AS BIGINT) AS n_clusters,
         |       CAST(sum(sz) AS BIGINT) AS n_docs,
         |       CAST(sum(sz - 1) AS BIGINT) AS n_removable
         |FROM cs GROUP BY 1 ORDER BY cluster_size""".stripMargin,
    // passage-level substring dedup: positional 3-grams, cross-doc
    // duplicated iff min(doc)≠max(doc) per gram, consecutive
    // positions island-merged (pos − row_number) into maximal spans
    // passage-level substring dedup: positional 3-grams, cross-doc
    // duplicated iff min(doc)≠max(doc) per gram, consecutive
    // positions island-merged (pos − row_number) into maximal spans
    "dedup_substring" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
        |st AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
        |mxl AS (SELECT CAST(coalesce(max(len(toks)), 0) AS BIGINT)
        |          AS m FROM st),
        |g AS (SELECT doc_id, pos,
        |        toks[pos+1] || ' ' || toks[pos+2] || ' ' || toks[pos+3] AS s
        |      FROM st CROSS JOIN
        |        (SELECT unnest(range(m)) AS pos FROM mxl)
        |      WHERE pos <= len(toks) - 3),
        |d AS (SELECT s FROM g GROUP BY s HAVING min(doc_id) <> max(doc_id)),
        |p AS (SELECT doc_id, pos,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |      FROM g WHERE s IN (SELECT s FROM d)),
        |isl AS (SELECT doc_id, pos - rn AS grp, min(pos) AS a, max(pos) AS b
        |        FROM p GROUP BY 1, 2)
        |SELECT doc_id, CAST(a AS BIGINT) AS span_start,
        |       CAST(b + 2 AS BIGINT) AS span_end,
        |       CAST(b - a + 3 AS BIGINT) AS span_tokens
        |FROM isl WHERE b - a + 3 >= 8
        |ORDER BY doc_id, span_start""".stripMargin,
    "dedup_simhash60_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)),
        |v AS (SELECT doc_id, bit,
        |        sum(CASE WHEN (h // (1::BIGINT << bit)) % 2 = 1
        |              THEN 1 ELSE -1 END) AS vote
        |      FROM u CROSS JOIN (SELECT unnest(range(60)) AS bit) GROUP BY 1, 2),
        |sg AS (SELECT doc_id,
        |         CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END)
        |           AS BIGINT) AS sh
        |       FROM v GROUP BY doc_id),
        |bands AS (SELECT doc_id, sh, band,
        |            (sh // (1::BIGINT << (band * 10))) % 1024 AS key
        |          FROM sg CROSS JOIN (SELECT unnest(range(6)) AS band) b(band)),
        |cand AS (SELECT DISTINCT
        |           least(a.doc_id, b.doc_id) AS id1,
        |           greatest(a.doc_id, b.doc_id) AS id2,
        |           CASE WHEN a.doc_id < b.doc_id THEN a.sh ELSE b.sh END AS h1,
        |           CASE WHEN a.doc_id < b.doc_id THEN b.sh ELSE a.sh END AS h2
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.key = b.key
        |             AND a.doc_id < b.doc_id)
        |SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(h1, h2)) <= 5
        |ORDER BY id1, id2""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $shingleCte,
         |blk AS (SELECT doc_id, shingles,
         |          md5(CAST(list_min(list_transform(shingles,
         |                s -> CAST('0x' || substr(md5('b0|' || s), 1, 15)
         |                       AS BIGINT))) AS VARCHAR)
         |            || '|' ||
         |            CAST(list_min(list_transform(shingles,
         |                s -> CAST('0x' || substr(md5('b1|' || s), 1, 15)
         |                       AS BIGINT))) AS VARCHAR)) AS block
         |        FROM sh),
         |cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2
         |         FROM blk a JOIN blk b ON a.block = b.block
         |           AND a.doc_id < b.doc_id),
         |$jaccardVerify""".stripMargin,
    // mirrors Ann.hyperplanes exactly: component (t,p,d) =
    // (first-4-md5-bytes-as-int & 0x7fffffff)/Int.MaxValue*2-1, and
    // list_inner_product's strict left-to-right summation matches
    // VecDot (same reason the knn oracles hash-match)
    // mirrors Ann.hyperplanes exactly: component (t,p,d) =
    // (first-4-md5-bytes-as-int & 0x7fffffff)/Int.MaxValue*2-1, and
    // list_inner_product's strict left-to-right summation matches
    // VecDot (same reason the knn oracles hash-match)
    "dedup_embedding_cos" ->
      """WITH hpw AS (
        |  SELECT t, p, d,
        |    ((CAST('0x' || substr(md5(CAST(t AS VARCHAR) || '|' ||
        |        CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 8)
        |        AS BIGINT) & 2147483647) / 2147483647.0 * 2.0 - 1.0) AS w
        |  FROM range(4) r1(t) CROSS JOIN range(4) r2(p)
        |       CROSS JOIN range(64) r3(d)),
        |hp AS (SELECT t, p, list(w ORDER BY d) AS wv FROM hpw GROUP BY t, p),
        |dots AS (SELECT e.vec_id, hp.t, hp.p,
        |           list_inner_product(e.embedding::DOUBLE[], hp.wv) AS dp
        |         FROM embeddings e CROSS JOIN hp),
        |sg AS (SELECT vec_id, t,
        |         sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS sig
        |       FROM dots GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
        |         FROM sg a JOIN sg b
        |           ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id)
        |SELECT c.id1 AS id1, c.id2 AS id2,
        |       round(list_cosine_similarity(x.embedding::DOUBLE[],
        |                                    y.embedding::DOUBLE[]), 4) AS cosine
        |FROM cand c JOIN embeddings x ON c.id1 = x.vec_id
        |JOIN embeddings y ON c.id2 = y.vec_id
        |WHERE list_cosine_similarity(x.embedding::DOUBLE[],
        |                             y.embedding::DOUBLE[]) >= 0.35
        |ORDER BY id1, id2""".stripMargin,
    // cosine-threshold sweep: the shipped pairs' ROUNDED cosines
    // gridded cumulative-from-above, zero-anchored literal grid
    // cosine-threshold sweep: the shipped pairs' ROUNDED cosines
    // gridded cumulative-from-above, zero-anchored literal grid
    "dedup_cos_sweep" ->
      """WITH hpw AS (
        |  SELECT t, p, d,
        |    ((CAST('0x' || substr(md5(CAST(t AS VARCHAR) || '|' ||
        |        CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 8)
        |        AS BIGINT) & 2147483647) / 2147483647.0 * 2.0 - 1.0) AS w
        |  FROM range(4) r1(t) CROSS JOIN range(4) r2(p)
        |       CROSS JOIN range(64) r3(d)),
        |hp AS (SELECT t, p, list(w ORDER BY d) AS wv FROM hpw GROUP BY t, p),
        |dots AS (SELECT e.vec_id, hp.t, hp.p,
        |           list_inner_product(e.embedding::DOUBLE[], hp.wv) AS dp
        |         FROM embeddings e CROSS JOIN hp),
        |sg AS (SELECT vec_id, t,
        |         sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS sig
        |       FROM dots GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
        |         FROM sg a JOIN sg b
        |           ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id),
        |pr AS (SELECT round(list_cosine_similarity(x.embedding::DOUBLE[],
        |                 y.embedding::DOUBLE[]), 4) AS cosine
        |       FROM cand c JOIN embeddings x ON c.id1 = x.vec_id
        |       JOIN embeddings y ON c.id2 = y.vec_id
        |       WHERE list_cosine_similarity(x.embedding::DOUBLE[],
        |                                    y.embedding::DOUBLE[]) >= 0.35),
        |grd AS (SELECT CAST(threshold AS DOUBLE) AS threshold
        |        FROM (VALUES (0.35), (0.5), (0.65), (0.8), (0.95))
        |          g(threshold)),
        |cnt AS (SELECT grd.threshold, CAST(count(*) AS BIGINT) AS n_pairs
        |        FROM pr JOIN grd ON pr.cosine >= grd.threshold
        |        GROUP BY 1)
        |SELECT grd.threshold,
        |       CAST(coalesce(cnt.n_pairs, 0) AS BIGINT) AS n_pairs
        |FROM grd LEFT JOIN cnt USING (threshold)
        |ORDER BY threshold""".stripMargin,
    // semantic decontam: cross-split LSH bucket mates -> exact cosine
    // -> per-eval argmax by (cosine DESC, train_id) — the mirror's
    // row_number replays the max_by(struct(c, -train_id)) ordering
    // semantic decontam: cross-split LSH bucket mates -> exact cosine
    // -> per-eval argmax by (cosine DESC, train_id) — the mirror's
    // row_number replays the max_by(struct(c, -train_id)) ordering
    "decontam_semantic" ->
      """WITH hpw AS (
        |  SELECT t, p, d,
        |    ((CAST('0x' || substr(md5(CAST(t AS VARCHAR) || '|' ||
        |        CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 8)
        |        AS BIGINT) & 2147483647) / 2147483647.0 * 2.0 - 1.0) AS w
        |  FROM range(4) r1(t) CROSS JOIN range(4) r2(p)
        |       CROSS JOIN range(64) r3(d)),
        |hp AS (SELECT t, p, list(w ORDER BY d) AS wv FROM hpw GROUP BY t, p),
        |sp AS (SELECT vec_id,
        |         CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 4)
        |                   < 'cccd'
        |              THEN 'train' ELSE 'eval' END AS split
        |       FROM embeddings),
        |dots AS (SELECT e.vec_id, hp.t, hp.p,
        |           list_inner_product(e.embedding::DOUBLE[], hp.wv) AS dp
        |         FROM embeddings e CROSS JOIN hp),
        |sg AS (SELECT vec_id, t,
        |         sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS sig
        |       FROM dots GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT q.vec_id AS eval_id, t2.vec_id AS train_id
        |         FROM sg q JOIN sg t2 ON q.t = t2.t AND q.sig = t2.sig
        |         JOIN sp sq ON q.vec_id = sq.vec_id
        |         JOIN sp st ON t2.vec_id = st.vec_id
        |         WHERE sq.split = 'eval' AND st.split = 'train'),
        |scored AS (SELECT c.eval_id, c.train_id,
        |             list_cosine_similarity(x.embedding::DOUBLE[],
        |                                    y.embedding::DOUBLE[]) AS cs
        |           FROM cand c JOIN embeddings x ON c.eval_id = x.vec_id
        |           JOIN embeddings y ON c.train_id = y.vec_id
        |           WHERE list_cosine_similarity(x.embedding::DOUBLE[],
        |                                        y.embedding::DOUBLE[])
        |                   >= 0.35),
        |r AS (SELECT *, row_number() OVER (PARTITION BY eval_id
        |        ORDER BY cs DESC, train_id) AS rk
        |      FROM scored)
        |SELECT eval_id, train_id, round(cs, 4) AS cosine
        |FROM r WHERE rk = 1 ORDER BY eval_id""".stripMargin,
    // incremental near-dedup: batch (planted +200000 near-dups) bands
    // joined against corpus bands — candidates are CROSS pairs only
    "dedup_incremental" ->
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 200000, text || ' zzyzx'
         |  FROM documents WHERE doc_id % 9 = 0),
         |bids AS (SELECT doc_id + 200000 AS doc_id
         |         FROM documents WHERE doc_id % 9 = 0),
         |${bandCteFrom("docs")},
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bk a JOIN bk b ON a.band = b.band
         |           AND a.band_key = b.band_key
         |         WHERE a.doc_id IN (SELECT doc_id FROM bids)
         |           AND b.doc_id NOT IN (SELECT doc_id FROM bids)),
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS n
         |          FROM shx x JOIN shx y ON x.s = y.s
         |          WHERE x.doc_id IN (SELECT doc_id FROM bids)
         |            AND y.doc_id NOT IN (SELECT doc_id FROM bids)
         |          GROUP BY 1, 2)
         |SELECT c.id1 AS id1, c.id2 AS id2,
         |       round(n*1.0/(c1.c + c2.c - n), 4) AS jaccard
         |FROM cand c JOIN inter i ON c.id1 = i.id1 AND c.id2 = i.id2
         |JOIN card c1 ON c.id1 = c1.doc_id JOIN card c2 ON c.id2 = c2.doc_id
         |WHERE n*1.0/(c1.c + c2.c - n) >= 0.5 ORDER BY c.id1, c.id2""".stripMargin,
    // bucketing must never change results: the oracle is the PLAIN
    // join — hash equality proves layout-invariance (the plan
    // property itself is pinned in LayoutSpec),
  )
}
