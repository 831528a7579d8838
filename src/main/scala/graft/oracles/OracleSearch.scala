package graft

/** Search-family oracle SQL — split verbatim from SparkEntry
  * (r12, r11 verdict #7). The registry stays in SparkEntry;
  * these maps are its DuckDB mirrors, byte-identical to the
  * pre-split strings.
  */
private[graft] object OracleSearch {
  import OracleCtes._

  val sql: Map[String, String] = Map(
    // nDCG@10 of the IVF path: graded relevance 11−rank from the
    // exact cosine top-10, discounted by log2(rank+1) over the
    // system's own ordering; idcg from the exact list's own ranks
    // MRR legs share the ndcg oracle's system/exact scans; rr_top1
    // tracks the exact rank-1 item, rr_first_rel any exact-top-10
    "search_mrr" ->
      s"""WITH $ivfCtes,
         |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv)
         |         AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |       JOIN q ON pr.qid = q.qid),
         |r AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM sc WHERE s IS NOT NULL),
         |sys AS (SELECT qid, id, rk FROM r WHERE rk <= 10),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |ex AS (SELECT qid, id, rk AS erk FROM br WHERE rk <= 10),
         |h AS (SELECT s.qid, s.rk, ex.erk FROM sys s
         |      JOIN ex ON s.qid = ex.qid AND s.id = ex.id),
         |t1 AS (SELECT qid, min(rk) AS r1 FROM h WHERE erk = 1
         |       GROUP BY 1),
         |ta AS (SELECT qid, min(rk) AS ra,
         |         CAST(count(*) AS BIGINT) AS n_rel_found
         |       FROM h GROUP BY 1)
         |SELECT q.qid,
         |       round(coalesce(CAST(1 AS DOUBLE) / t1.r1, 0), 4)
         |         AS rr_top1,
         |       round(coalesce(CAST(1 AS DOUBLE) / ta.ra, 0), 4)
         |         AS rr_first_rel,
         |       CAST(coalesce(ta.n_rel_found, 0) AS BIGINT)
         |         AS n_rel_found
         |FROM q LEFT JOIN t1 ON q.qid = t1.qid
         |LEFT JOIN ta ON q.qid = ta.qid ORDER BY q.qid""".stripMargin,
    "search_ndcg" ->
      s"""WITH $ivfCtes,
         |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv)
         |         AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |       JOIN q ON pr.qid = q.qid),
         |r AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM sc WHERE s IS NOT NULL),
         |sys AS (SELECT qid, id, rk FROM r WHERE rk <= 10),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |ex AS (SELECT qid, id, rk, 11 - rk AS rel FROM br WHERE rk <= 10),
         |d AS (SELECT s.qid,
         |        sum(coalesce(ex.rel, 0) * 1.0 / log2(s.rk + 1)) AS dcg
         |      FROM sys s LEFT JOIN ex ON s.qid = ex.qid AND s.id = ex.id
         |      GROUP BY 1),
         |i AS (SELECT qid, sum(rel * 1.0 / log2(rk + 1)) AS idcg
         |      FROM ex GROUP BY 1)
         |SELECT d.qid, round(d.dcg, 4) AS dcg, round(i.idcg, 4) AS idcg,
         |       round(d.dcg / i.idcg, 4) AS ndcg
         |FROM d JOIN i ON d.qid = i.qid ORDER BY d.qid""".stripMargin,
    // random-projection kNN: fixed ±1 matrix from md5("j|i") (the
    // sign-LSH weight discipline), top-50 by projected L2, exact
    // cosine rerank to 10
    "text_bm25_topk" ->
      s"""WITH $bm25Ctes
         |SELECT qid, rk, doc_id, score FROM r WHERE rk <= 10
         |ORDER BY qid, rk""".stripMargin,
    // BM25F: title = first 8 tokens (weight 2), body = rest (weight
    // 1); per-field normalization inside the weighted tf̃, doc-level
    // idf; field legs pivot to COLUMNS so the weighted sum is one
    // fixed-order double expression
    // BM25F: title = first 8 tokens (weight 2), body = rest (weight
    // 1); per-field normalization inside the weighted tf̃, doc-level
    // idf; field legs pivot to COLUMNS so the weighted sum is one
    // fixed-order double expression
    "search_bm25f" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
         |        CAST(least(len(string_split(text, ' ')), 8) AS DOUBLE)
         |          AS dl_t,
         |        CAST(greatest(len(string_split(text, ' ')) - 8, 0)
         |          AS DOUBLE) AS dl_b
         |      FROM documents WHERE text IS NOT NULL),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |         avg(dl_t) AS avg_t, avg(dl_b) AS avg_b FROM d),
         |q AS ($bm25QValues),
         |qt AS (SELECT DISTINCT qid, term FROM
         |        (SELECT qid, unnest(string_split(qtext, ' ')) AS term
         |         FROM q)),
         |terms AS (SELECT DISTINCT term FROM qt),
         |ex AS (SELECT doc_id, dl_t, dl_b,
         |         toks[CAST(i AS INTEGER)] AS term, i - 1 AS pos
         |       FROM d, unnest(range(1, len(toks) + 1)) AS t(i)),
         |p AS (SELECT doc_id, term, dl_t, dl_b,
         |        CAST(sum(CASE WHEN pos < 8 THEN 1 ELSE 0 END)
         |          AS DOUBLE) AS tf_t,
         |        CAST(sum(CASE WHEN pos >= 8 THEN 1 ELSE 0 END)
         |          AS DOUBLE) AS tf_b
         |      FROM ex JOIN terms USING (term) GROUP BY 1, 2, 3, 4),
         |idf AS (SELECT term,
         |          ln((st.n_docs - dfreq + CAST(0.5 AS DOUBLE))
         |             / (dfreq + CAST(0.5 AS DOUBLE))
         |             + CAST(1.0 AS DOUBLE)) AS idf,
         |          st.avg_t, st.avg_b
         |        FROM (SELECT term, CAST(count(*) AS DOUBLE) AS dfreq
         |              FROM p GROUP BY 1), st),
         |tc AS (SELECT qt.qid, p.doc_id, idf.idf,
         |         CAST(2.0 AS DOUBLE) * p.tf_t
         |           / (CAST(0.25 AS DOUBLE)
         |              + CAST(0.75 AS DOUBLE) * p.dl_t / idf.avg_t)
         |         + CAST(1.0 AS DOUBLE) * p.tf_b
         |           / (CAST(0.25 AS DOUBLE)
         |              + CAST(0.75 AS DOUBLE) * p.dl_b / idf.avg_b)
         |           AS tfn
         |       FROM p JOIN idf USING (term) JOIN qt USING (term)),
         |c AS (SELECT qid, doc_id,
         |        idf * tfn / (CAST(1.2 AS DOUBLE) + tfn) AS contrib
         |      FROM tc),
         |fsc AS (SELECT qid, doc_id, round(sum(contrib), 4) AS score
         |        FROM c GROUP BY 1, 2),
         |fr2 AS (SELECT qid, doc_id, score,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY score DESC, doc_id) AS rk
         |        FROM fsc)
         |SELECT qid, rk, doc_id, score FROM fr2 WHERE rk <= 10
         |ORDER BY qid, rk""".stripMargin,
    // filter-query semantics: global idf/avgdl, candidates restricted
    // filter-query semantics: global idf/avgdl, candidates restricted
    "text_bm25_filtered" ->
      s"""WITH ${bm25CtesWhere(" WHERE p.doc_id IN (SELECT doc_id " +
           "FROM documents WHERE lang IN ('en', 'de'))")}
         |SELECT qid, rk, doc_id, score FROM r WHERE rk <= 10
         |ORDER BY qid, rk""".stripMargin,
    // persisted-postings twin: same integers (tf, df, N, dl) into the
    // same formula → equal to the on-the-fly path by construction
    // (SearchSpec pins it), so it shares the oracle
    // persisted-postings twin: same integers (tf, df, N, dl) into the
    // same formula → equal to the on-the-fly path by construction
    // (SearchSpec pins it), so it shares the oracle
    "text_bm25_indexed" ->
      s"""WITH $bm25Ctes
         |SELECT qid, rk, doc_id, score FROM r WHERE rk <= 10
         |ORDER BY qid, rk""".stripMargin,
    // facets from the RESULT SET: lang/source distributions of the
    // bm25 top-10, stacked facet dims
    // facets from the RESULT SET: lang/source distributions of the
    // bm25 top-10, stacked facet dims
    "search_facets" ->
      s"""WITH $bm25Ctes,
         |h AS (SELECT r.qid, d.lang, d.source
         |      FROM r JOIN documents d USING (doc_id) WHERE r.rk <= 10),
         |u AS (SELECT qid, 'lang' AS facet, lang AS value FROM h
         |      UNION ALL SELECT qid, 'source', source FROM h)
         |SELECT qid, facet, value, CAST(count(*) AS BIGINT) AS n
         |FROM u GROUP BY 1, 2, 3 ORDER BY qid, facet, value""".stripMargin,
    "search_mmr_rerank" -> mmrOracle,
    // spell correction: OOV query terms replaced by their ED-1 vocab
    // neighbor (df DESC, term tiebreak; naive levenshtein join here
    // — the Spark side uses SymSpell deletion blocking), corrected
    // queries feed the SAME bm25 chain via the custom q source
    // spell correction: OOV query terms replaced by their ED-1 vocab
    // neighbor (df DESC, term tiebreak; naive levenshtein join here
    // — the Spark side uses SymSpell deletion blocking), corrected
    // queries feed the SAME bm25 chain via the custom q source
    "search_spell_correct" -> spellOracle,
    // autocomplete: top-3 completions per 2-char vocabulary prefix
    // by document frequency (same distinct-per-doc tokenization)
    // autocomplete: top-3 completions per 2-char vocabulary prefix
    // by document frequency (same distinct-per-doc tokenization)
    "search_query_suggest" ->
      """WITH toks AS (SELECT DISTINCT doc_id, t.term FROM documents,
        |                unnest(string_split(text, ' ')) AS t(term)
        |              WHERE len(t.term) >= 3),
        |v AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |      FROM toks GROUP BY 1 HAVING count(*) >= 5),
        |p AS (SELECT substr(term, 1, 2) AS prefix, term, df,
        |        row_number() OVER (PARTITION BY substr(term, 1, 2)
        |                           ORDER BY df DESC, term) AS rk
        |      FROM v)
        |SELECT prefix, rk, term, df FROM p WHERE rk <= 3
        |ORDER BY prefix, rk""".stripMargin,
    // persisted-dictionary twin: identical correction semantics
    // (SearchSpec pins equality + bucket pruning), shares the oracle
    // persisted-dictionary twin: identical correction semantics
    // (SearchSpec pins equality + bucket pruning), shares the oracle
    "search_spell_indexed" -> spellOracle,
    // boolean retrieval: conjunction = counting over the distinct
    // postings, NOT leg as an anti-join (NOT EXISTS)
    // boolean retrieval: conjunction = counting over the distinct
    // postings, NOT leg as an anti-join (NOT EXISTS)
    "search_boolean" ->
      """WITH must AS (SELECT * FROM (VALUES (0, 'spark'), (0, 'join'),
        |                (1, 'vector'), (1, 'scan'), (2, 'customer'),
        |                (2, 'order')) AS t(qid, term)),
        |nm AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_must
        |       FROM must GROUP BY 1),
        |nt AS (SELECT * FROM (VALUES (0, 'slow'), (1, 'dup'),
        |         (2, 'big')) AS t(qid, term)),
        |toks AS (SELECT DISTINCT doc_id, t.term FROM documents,
        |           unnest(string_split(text, ' ')) AS t(term)),
        |conj AS (SELECT m.qid, toks.doc_id,
        |           CAST(count(*) AS BIGINT) AS n_hit
        |         FROM toks JOIN must m USING (term) GROUP BY 1, 2),
        |hits AS (SELECT c.qid, c.doc_id FROM conj c JOIN nm USING (qid)
        |         WHERE c.n_hit = nm.n_must),
        |ex AS (SELECT n.qid, toks.doc_id
        |       FROM toks JOIN nt n USING (term))
        |SELECT qid, doc_id FROM hits
        |WHERE NOT EXISTS (SELECT 1 FROM ex
        |  WHERE ex.qid = hits.qid AND ex.doc_id = hits.doc_id)
        |ORDER BY qid, doc_id""".stripMargin,
    // wildcard: dictionary probe on the 2-char prefix bucket +
    // residual starts_with, docs ranked by total matching-term tf
    // wildcard: dictionary probe on the 2-char prefix bucket +
    // residual starts_with, docs ranked by total matching-term tf
    "search_prefix" -> prefixOracle,
    // persisted-dictionary twin: identical semantics off the
    // pfx-partitioned dictionary + pruned postings (SearchSpec pins
    // equality + both prunings), shares the oracle
    // persisted-dictionary twin: identical semantics off the
    // pfx-partitioned dictionary + pruned postings (SearchSpec pins
    // equality + both prunings), shares the oracle
    "search_prefix_indexed" -> prefixOracle,
    // pseudo-relevance feedback: round-1 bm25 (shared CTEs) → top-5
    // feedback docs → tf·idf-ranked expansion terms (NOT EXISTS
    // drops original query terms, sorted-list append keeps the
    // expanded string deterministic) → round-2 bm25 with y-prefixed
    // CTE copies over the SAME d/st/ex corpus CTEs
    // pseudo-relevance feedback: round-1 bm25 (shared CTEs) → top-5
    // feedback docs → tf·idf-ranked expansion terms (NOT EXISTS
    // drops original query terms, sorted-list append keeps the
    // expanded string deterministic) → round-2 bm25 with y-prefixed
    // CTE copies over the SAME d/st/ex corpus CTEs
    "search_prf_expand" ->
      s"""WITH $bm25Ctes,
         |t5 AS (SELECT qid, doc_id FROM r WHERE rk <= 5),
         |fb AS (SELECT t5.qid, ex.term, CAST(count(*) AS BIGINT) AS tf
         |       FROM t5 JOIN ex ON t5.doc_id = ex.doc_id
         |       GROUP BY 1, 2),
         |cand AS (SELECT fb.qid, fb.term, fb.tf FROM fb
         |         WHERE NOT EXISTS (SELECT 1 FROM qt
         |           WHERE qt.qid = fb.qid AND qt.term = fb.term)),
         |cdf AS (SELECT ex.term,
         |          CAST(count(DISTINCT ex.doc_id) AS DOUBLE) AS dfreq
         |        FROM ex JOIN (SELECT DISTINCT term FROM cand) ct
         |          ON ex.term = ct.term
         |        GROUP BY 1),
         |ws AS (SELECT cand.qid, cand.term,
         |         cand.tf * ln((SELECT n_docs FROM st) / cdf.dfreq) AS w
         |       FROM cand JOIN cdf ON cand.term = cdf.term),
         |exp3 AS (SELECT qid, term FROM (SELECT qid, term,
         |           row_number() OVER (PARTITION BY qid
         |             ORDER BY w DESC, term) AS xrk
         |         FROM ws) WHERE xrk <= 3),
         |q2 AS (SELECT q.qid, CASE WHEN e.ext IS NOT NULL
         |           THEN concat(q.qtext, ' ', e.ext) ELSE q.qtext END
         |           AS qtext
         |       FROM q LEFT JOIN (SELECT qid,
         |           array_to_string(list_sort(list(term)), ' ') AS ext
         |         FROM exp3 GROUP BY qid) e ON q.qid = e.qid),
         |yqt AS (SELECT DISTINCT qid, term FROM
         |        (SELECT qid, unnest(string_split(qtext, ' ')) AS term
         |         FROM q2)),
         |yterms AS (SELECT DISTINCT term FROM yqt),
         |yp AS (SELECT term, doc_id, dl, CAST(count(*) AS DOUBLE) AS tf
         |      FROM ex JOIN yterms USING (term) GROUP BY 1, 2, 3),
         |yidf AS (SELECT term,
         |               ln((st.n_docs - dfreq + CAST(0.5 AS DOUBLE))
         |                  / (dfreq + CAST(0.5 AS DOUBLE))
         |                  + CAST(1.0 AS DOUBLE)) AS idf,
         |               st.avgdl
         |        FROM (SELECT term, CAST(count(*) AS DOUBLE) AS dfreq
         |              FROM yp GROUP BY 1), st),
         |yc AS (SELECT yqt.qid, yp.doc_id,
         |             yidf.idf * yp.tf
         |             * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
         |             / (yp.tf + CAST(1.2 AS DOUBLE)
         |                * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
         |                   + CAST(0.75 AS DOUBLE) * yp.dl / yidf.avgdl))
         |               AS contrib
         |      FROM yp JOIN yidf USING (term) JOIN yqt USING (term)),
         |ysc AS (SELECT qid, doc_id, round(sum(contrib), 4) AS score
         |       FROM yc GROUP BY 1, 2),
         |yr AS (SELECT qid, doc_id, score,
         |             row_number() OVER (PARTITION BY qid
         |                                ORDER BY score DESC, doc_id) AS rk
         |      FROM ysc)
         |SELECT qid, rk, doc_id, score FROM yr WHERE rk <= 10
         |ORDER BY qid, rk""".stripMargin,
    // RRF fusion of the BM25 top-20 with the cosine top-20 (self
    // match included — Knn.topK does not exclude it). rrf arithmetic
    // is integer-derived → bit-identical across engines; ranked on
    // the rounded rrf with doc_id tiebreak anyway for safety.
    // RRF fusion of the BM25 top-20 with the cosine top-20 (self
    // match included — Knn.topK does not exclude it). rrf arithmetic
    // is integer-derived → bit-identical across engines; ranked on
    // the rounded rrf with doc_id tiebreak anyway for safety.
    "hybrid_search_rrf" ->
      s"""WITH $bm25Ctes,
         |b AS (SELECT qid, doc_id, rk FROM r WHERE rk <= 20),
         |qe AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < 5),
         |cd AS (SELECT qe.qid, e.vec_id AS doc_id,
         |              list_cosine_similarity(e.embedding::DOUBLE[], qe.qv)
         |                AS s
         |       FROM embeddings e CROSS JOIN qe),
         |cr AS (SELECT qid, doc_id,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, doc_id) AS rk
         |       FROM cd),
         |c20 AS (SELECT qid, doc_id, rk FROM cr WHERE rk <= 20),
         |f AS (SELECT coalesce(b.qid, c20.qid) AS qid,
         |             coalesce(b.doc_id, c20.doc_id) AS doc_id,
         |             b.rk AS brk, c20.rk AS crk
         |      FROM b FULL OUTER JOIN c20
         |        ON b.qid = c20.qid AND b.doc_id = c20.doc_id),
         |g AS (SELECT qid, doc_id,
         |             round(coalesce(CAST(1.0 AS DOUBLE)
         |                              / (CAST(60.0 AS DOUBLE) + brk),
         |                            CAST(0.0 AS DOUBLE))
         |                 + coalesce(CAST(1.0 AS DOUBLE)
         |                              / (CAST(60.0 AS DOUBLE) + crk),
         |                            CAST(0.0 AS DOUBLE)), 6) AS rrf_score,
         |             coalesce(brk, 0) AS bm25_rk,
         |             coalesce(crk, 0) AS cos_rk
         |      FROM f),
         |h AS (SELECT *, row_number() OVER (PARTITION BY qid
         |                                   ORDER BY rrf_score DESC, doc_id)
         |                  AS rk FROM g)
         |SELECT qid, rk, doc_id, rrf_score, bm25_rk, cos_rk FROM h
         |WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // DBSF fusion: per-leg integer moments over the 4dp-quantized
    // scores, (s − μ + 3σ)/6σ with one sqrt per (qid, leg), σ=0 →
    // 0.5; absent leg contributes 0; window top-10 on the fused sum
    "hybrid_search_dbsf" ->
      s"""WITH $bm25Ctes,
         |b AS (SELECT qid, doc_id,
         |        CAST(round(score * 10000) AS BIGINT) AS m, 'bm' AS leg
         |      FROM r WHERE rk <= 20),
         |qe AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < 5),
         |cd AS (SELECT qe.qid, e.vec_id AS doc_id,
         |              list_cosine_similarity(e.embedding::DOUBLE[], qe.qv)
         |                AS s
         |       FROM embeddings e CROSS JOIN qe),
         |cr AS (SELECT qid, doc_id, s,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, doc_id) AS rk
         |       FROM cd WHERE s IS NOT NULL),
         |c20 AS (SELECT qid, doc_id,
         |          CAST(round(round(s, 4) * 10000) AS BIGINT) AS m,
         |          'cos' AS leg
         |        FROM cr WHERE rk <= 20),
         |legs AS (SELECT * FROM b UNION ALL SELECT * FROM c20),
         |mo AS (SELECT qid, leg, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(m) AS BIGINT) AS sx,
         |         CAST(sum(m * m) AS BIGINT) AS qx
         |       FROM legs GROUP BY 1, 2),
         |nr AS (SELECT l.qid, l.doc_id,
         |         CASE WHEN mo.n * mo.qx - mo.sx * mo.sx = 0
         |           THEN CAST(0.5 AS DOUBLE)
         |           ELSE (CAST(l.m AS DOUBLE)
         |                   - CAST(mo.sx AS DOUBLE) / CAST(mo.n AS DOUBLE)
         |                 + CAST(3.0 AS DOUBLE)
         |                   * (sqrt(CAST(mo.n * mo.qx - mo.sx * mo.sx
         |                        AS DOUBLE)) / CAST(mo.n AS DOUBLE)))
         |                / (CAST(6.0 AS DOUBLE)
         |                   * (sqrt(CAST(mo.n * mo.qx - mo.sx * mo.sx
         |                        AS DOUBLE)) / CAST(mo.n AS DOUBLE)))
         |         END AS nrm
         |       FROM legs l JOIN mo ON l.qid = mo.qid AND l.leg = mo.leg),
         |f AS (SELECT qid, doc_id, sum(nrm) AS f FROM nr GROUP BY 1, 2),
         |h AS (SELECT *, row_number() OVER (PARTITION BY qid
         |                                   ORDER BY f DESC, doc_id) AS rk
         |      FROM f)
         |SELECT qid, rk, doc_id, round(f, 4) AS dbsf_score FROM h
         |WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // WeightedRanker: per-leg exact-integer min-max, weighted sum
    // 0.3 lexical + 0.7 dense; single-valued leg → 0.5
    "hybrid_search_weighted" ->
      s"""WITH $bm25Ctes,
         |b AS (SELECT qid, doc_id,
         |        CAST(round(score * 10000) AS BIGINT) AS m, 'bm' AS leg
         |      FROM r WHERE rk <= 20),
         |qe AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < 5),
         |cd AS (SELECT qe.qid, e.vec_id AS doc_id,
         |              list_cosine_similarity(e.embedding::DOUBLE[], qe.qv)
         |                AS s
         |       FROM embeddings e CROSS JOIN qe),
         |cr AS (SELECT qid, doc_id, s,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, doc_id) AS rk
         |       FROM cd WHERE s IS NOT NULL),
         |c20 AS (SELECT qid, doc_id,
         |          CAST(round(round(s, 4) * 10000) AS BIGINT) AS m,
         |          'cos' AS leg
         |        FROM cr WHERE rk <= 20),
         |legs AS (SELECT * FROM b UNION ALL SELECT * FROM c20),
         |ext AS (SELECT qid, leg, min(m) AS mn, max(m) AS mx
         |        FROM legs GROUP BY 1, 2),
         |dens AS (SELECT qid,
         |           coalesce(sum(CASE WHEN leg = 'bm' THEN
         |             CASE WHEN mx = mn THEN 20
         |                  ELSE 10 * (mx - mn) END END), 1) AS den_bm,
         |           coalesce(sum(CASE WHEN leg = 'cos' THEN
         |             CASE WHEN mx = mn THEN 20
         |                  ELSE 10 * (mx - mn) END END), 1) AS den_cos
         |         FROM ext GROUP BY 1),
         |nr AS (SELECT l.qid, l.doc_id,
         |         CAST((CASE WHEN e.mx = e.mn
         |                 THEN CASE WHEN l.leg = 'bm' THEN 3 ELSE 7 END
         |                 ELSE (CASE WHEN l.leg = 'bm' THEN 3 ELSE 7 END)
         |                      * (l.m - e.mn) END)
         |              * (CASE WHEN l.leg = 'bm' THEN d.den_cos
         |                      ELSE d.den_bm END) AS BIGINT) AS num,
         |         CAST(d.den_bm * d.den_cos AS BIGINT) AS den_q
         |       FROM legs l JOIN ext e ON l.qid = e.qid AND l.leg = e.leg
         |                   JOIN dens d ON l.qid = d.qid),
         |f AS (SELECT qid, doc_id, sum(num) AS fnum, min(den_q) AS den_q
         |      FROM nr GROUP BY 1, 2),
         |h AS (SELECT *, row_number() OVER (PARTITION BY qid
         |                                   ORDER BY fnum DESC, doc_id)
         |                  AS rk FROM f)
         |SELECT qid, rk, doc_id,
         |       CAST((fnum * 20000 + den_q) // (den_q * 2) AS DOUBLE)
         |         / 10000.0 AS weighted_score
         |FROM h WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // sparse tf-idf dot: reuses the bm25 chain's p/idf/qt, different
    // scoring — tf·idf², no normalization/saturation by design
    // sparse tf-idf dot: reuses the bm25 chain's p/idf/qt, different
    // scoring — tf·idf², no normalization/saturation by design
    "vdb_knn_sparse" -> sparseOracle,
    // persisted-postings twin: same integers into the same formula,
    // equal to the on-the-fly path by construction — shares the oracle
    // persisted-postings twin: same integers into the same formula,
    // equal to the on-the-fly path by construction — shares the oracle
    "vdb_knn_sparse_indexed" -> sparseOracle,
    // alpha-weighted linear hybrid: per-query min-max normalized leg
    // scores (degenerate leg -> 1.0), fused rounded before ranking
    // alpha-weighted linear hybrid: per-query min-max normalized leg
    // scores (degenerate leg -> 1.0), fused rounded before ranking
    "hybrid_search_linear" ->
      s"""WITH $bm25Ctes,
         |b AS (SELECT qid, doc_id, score AS bs FROM r WHERE rk <= 20),
         |qe AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < 5),
         |cd AS (SELECT qe.qid, e.vec_id AS doc_id,
         |              list_cosine_similarity(e.embedding::DOUBLE[], qe.qv)
         |                AS s
         |       FROM embeddings e CROSS JOIN qe),
         |cr AS (SELECT qid, doc_id, round(s, 4) AS cs,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, doc_id) AS rk
         |       FROM cd),
         |c20 AS (SELECT qid, doc_id, cs FROM cr WHERE rk <= 20),
         |bmm AS (SELECT qid, min(bs) AS mn, max(bs) AS mx
         |        FROM b GROUP BY 1),
         |bn AS (SELECT b.qid, b.doc_id,
         |         CASE WHEN bmm.mx = bmm.mn THEN CAST(1.0 AS DOUBLE)
         |           ELSE (b.bs - bmm.mn) / (bmm.mx - bmm.mn) END AS nb
         |       FROM b JOIN bmm USING (qid)),
         |cmm AS (SELECT qid, min(cs) AS mn, max(cs) AS mx
         |        FROM c20 GROUP BY 1),
         |cn AS (SELECT c20.qid, c20.doc_id,
         |         CASE WHEN cmm.mx = cmm.mn THEN CAST(1.0 AS DOUBLE)
         |           ELSE (c20.cs - cmm.mn) / (cmm.mx - cmm.mn) END AS nc
         |       FROM c20 JOIN cmm USING (qid)),
         |fu AS (SELECT coalesce(bn.qid, cn.qid) AS qid,
         |         coalesce(bn.doc_id, cn.doc_id) AS doc_id,
         |         bn.nb AS nb, cn.nc AS nc
         |       FROM bn FULL OUTER JOIN cn
         |         ON bn.qid = cn.qid AND bn.doc_id = cn.doc_id),
         |fg AS (SELECT qid, doc_id,
         |         round(CAST(0.5 AS DOUBLE)
         |             * coalesce(nc, CAST(0.0 AS DOUBLE))
         |           + CAST(0.5 AS DOUBLE)
         |             * coalesce(nb, CAST(0.0 AS DOUBLE)), 6) AS hybrid,
         |         round(coalesce(nb, CAST(0.0 AS DOUBLE)), 6) AS bm25_norm,
         |         round(coalesce(nc, CAST(0.0 AS DOUBLE)), 6) AS cos_norm
         |       FROM fu),
         |fh AS (SELECT *, row_number() OVER (PARTITION BY qid
         |         ORDER BY hybrid DESC, doc_id) AS rk FROM fg)
         |SELECT qid, rk, doc_id, hybrid AS hybrid_score, bm25_norm,
         |       cos_norm
         |FROM fh WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // LTR fusion: integer-basis-point linear model over leg ranks +
    // quality prior; score is exact BIGINT so the ordering is
    // bit-deterministic (quality_bp = 4dp score ×10⁴, integral to
    // one ulp before the round-then-cast)
    // LTR fusion: integer-basis-point linear model over leg ranks +
    // quality prior; score is exact BIGINT so the ordering is
    // bit-deterministic (quality_bp = 4dp score ×10⁴, integral to
    // one ulp before the round-then-cast)
    "search_ltr_rerank" ->
      s"""WITH $bm25Ctes,
         |b AS (SELECT qid, doc_id, rk FROM r WHERE rk <= 20),
         |qe AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < 5),
         |cd AS (SELECT qe.qid, e.vec_id AS doc_id,
         |              list_cosine_similarity(e.embedding::DOUBLE[], qe.qv)
         |                AS s
         |       FROM embeddings e CROSS JOIN qe),
         |cr AS (SELECT qid, doc_id,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, doc_id) AS rk
         |       FROM cd),
         |c20 AS (SELECT qid, doc_id, rk FROM cr WHERE rk <= 20),
         |qs AS (SELECT doc_id, len(toks) AS n_tokens,
         |         len(list_filter(toks,
         |           t -> t IN ('the','a','and','of','to','in','is')))
         |           *1.0/len(toks) AS sw,
         |         1.0 - len(list_distinct(toks))*1.0/len(toks) AS rep
         |       FROM d),
         |qb AS (SELECT doc_id, CAST(round(round((least(n_tokens/50.0, 1.0)
         |         + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
         |         + (1.0 - least(rep/0.9, 1.0))) / 3.0, 4) * 10000)
         |         AS BIGINT) AS q_bp
         |       FROM qs),
         |f AS (SELECT coalesce(b.qid, c20.qid) AS qid,
         |             coalesce(b.doc_id, c20.doc_id) AS doc_id,
         |             b.rk AS brk, c20.rk AS crk
         |      FROM b FULL OUTER JOIN c20
         |        ON b.qid = c20.qid AND b.doc_id = c20.doc_id),
         |g AS (SELECT f.qid, f.doc_id,
         |             300*(21 - coalesce(brk, 21))
         |               + 300*(21 - coalesce(crk, 21))
         |               + coalesce(q_bp, 0) AS score_bp,
         |             coalesce(brk, 0) AS bm25_rk,
         |             coalesce(crk, 0) AS cos_rk,
         |             coalesce(q_bp, 0) AS quality_bp
         |      FROM f LEFT JOIN qb ON f.doc_id = qb.doc_id),
         |h AS (SELECT *, row_number() OVER (PARTITION BY qid
         |                                   ORDER BY score_bp DESC, doc_id)
         |                  AS rk FROM g)
         |SELECT qid, rk, doc_id, CAST(score_bp AS BIGINT) AS score_bp,
         |       bm25_rk, cos_rk, CAST(quality_bp AS BIGINT) AS quality_bp
         |FROM h WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // phrase search: anchor = pos − i collapses the m-way positional
    // self-join into one join + one (doc, anchor) aggregate
    // phrase search: anchor = pos − i collapses the m-way positional
    // self-join into one join + one (doc, anchor) aggregate
    "text_phrase_search" ->
      """WITH p(phrase, i, tok) AS (VALUES
        |    ('table hash', 0, 'table'), ('table hash', 1, 'hash'),
        |    ('customer join', 0, 'customer'), ('customer join', 1, 'join'),
        |    ('table hash value', 0, 'table'),
        |    ('table hash value', 1, 'hash'),
        |    ('table hash value', 2, 'value')),
        |m AS (SELECT phrase, CAST(count(*) AS BIGINT) AS m
        |      FROM p GROUP BY 1),
        |dt AS (SELECT doc_id, string_split(text, ' ') AS ts
        |       FROM documents),
        |t AS (SELECT doc_id, g.i - 1 AS pos, ts[g.i] AS tok
        |      FROM dt CROSS JOIN generate_series(1, 128) AS g(i)
        |      WHERE g.i <= len(ts)),
        |occ AS (SELECT p.phrase, t.doc_id, t.pos - p.i AS anchor,
        |               count(DISTINCT p.i) AS hits
        |        FROM t JOIN p ON t.tok = p.tok
        |        GROUP BY 1, 2, 3),
        |fo AS (SELECT o.phrase, o.doc_id, CAST(count(*) AS BIGINT) AS n_occ
        |       FROM occ o JOIN m USING (phrase)
        |       WHERE o.hits = m.m GROUP BY 1, 2),
        |r AS (SELECT phrase, doc_id, n_occ, row_number() OVER (
        |        PARTITION BY phrase ORDER BY n_occ DESC, doc_id) AS rk
        |      FROM fo)
        |SELECT phrase, rk, doc_id, n_occ
        |FROM r WHERE rk <= 10 ORDER BY phrase, rk""".stripMargin,
    // KWIC snippets on the shared BM25 chain: hit docs only
    // re-tokenize with positions, first query-term match anchors a
    // ±3-token slice
    // KWIC snippets on the shared BM25 chain: hit docs only
    // re-tokenize with positions, first query-term match anchors a
    // ±3-token slice
    "search_snippets" ->
      s"""WITH $bm25Ctes,
         |hits AS (SELECT qid, rk, doc_id FROM r WHERE rk <= 5),
         |tp AS (SELECT d.doc_id, g.i - 1 AS pos, d.toks[g.i] AS tok
         |       FROM d JOIN (SELECT DISTINCT doc_id FROM hits) hd
         |         USING (doc_id)
         |       CROSS JOIN generate_series(1, 128) AS g(i)
         |       WHERE g.i <= len(d.toks)),
         |an AS (SELECT h.qid, h.rk, h.doc_id, min(tp.pos) AS p
         |       FROM hits h JOIN qt ON h.qid = qt.qid
         |       JOIN tp ON tp.doc_id = h.doc_id AND tp.tok = qt.term
         |       GROUP BY 1, 2, 3)
         |SELECT an.qid, an.rk, an.doc_id,
         |       array_to_string(
         |         d.toks[greatest(p + 1 - 3, 1):(p + 1 + 3)], ' ')
         |         AS snippet
         |FROM an JOIN d USING (doc_id)
         |ORDER BY qid, rk""".stripMargin,
    // proximity phrase: all m distinct tokens inside an (m+slop)-
    // position window, matches counted by window start — the same
    // offset explode as the Spark plan
    // proximity phrase: all m distinct tokens inside an (m+slop)-
    // position window, matches counted by window start — the same
    // offset explode as the Spark plan
    "text_phrase_near" ->
      """WITH p(phrase, tok, m) AS (VALUES
        |    ('table hash', 'table', 2), ('table hash', 'hash', 2),
        |    ('customer join', 'customer', 2),
        |    ('customer join', 'join', 2),
        |    ('table hash value', 'table', 3),
        |    ('table hash value', 'hash', 3),
        |    ('table hash value', 'value', 3)),
        |dt AS (SELECT doc_id, string_split(text, ' ') AS ts
        |       FROM documents),
        |t AS (SELECT doc_id, g.i - 1 AS pos, ts[g.i] AS tok
        |      FROM dt CROSS JOIN generate_series(1, 128) AS g(i)
        |      WHERE g.i <= len(ts)),
        |wx AS (SELECT p.phrase, p.m, t.doc_id, t.tok,
        |         unnest(generate_series(greatest(t.pos - (p.m + 2) + 1,
        |           0), t.pos)) AS w
        |       FROM t JOIN p ON t.tok = p.tok),
        |mt AS (SELECT phrase, m, doc_id, w,
        |         count(DISTINCT tok) AS hits
        |       FROM wx GROUP BY 1, 2, 3, 4),
        |fo AS (SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS n_win
        |       FROM mt WHERE hits = m GROUP BY 1, 2),
        |r AS (SELECT phrase, doc_id, n_win, row_number() OVER (
        |        PARTITION BY phrase ORDER BY n_win DESC, doc_id) AS rk
        |      FROM fo)
        |SELECT phrase, rk, doc_id, n_win
        |FROM r WHERE rk <= 10 ORDER BY phrase, rk""".stripMargin,
    // MaxSim late interaction: per-(qtok, doc) max cosine quantized
    // to integer micro-units BEFORE the sum (round is monotone, so
    // quantize-then-max ≡ max-then-quantize; the fused score is then
    // exact BIGINT arithmetic on both engines)
    // MaxSim late interaction: per-(qtok, doc) max cosine quantized
    // to integer micro-units BEFORE the sum (round is monotone, so
    // quantize-then-max ≡ max-then-quantize; the fused score is then
    // exact BIGINT arithmetic on both engines)
    "search_maxsim" ->
      """WITH dt AS (SELECT CAST(vec_id AS BIGINT) // 8 AS doc_id,
        |                   embedding::DOUBLE[] AS v FROM embeddings),
        |qt AS (SELECT CAST(vec_id AS BIGINT) // 4 AS qid, vec_id AS qtok,
        |              embedding::DOUBLE[] AS qv
        |       FROM embeddings WHERE vec_id < 12),
        |m AS (SELECT qt.qid, qt.qtok, dt.doc_id,
        |             max(CAST(round(list_cosine_similarity(dt.v, qt.qv)
        |                            * 10000) AS BIGINT)) AS mu
        |      FROM dt CROSS JOIN qt GROUP BY 1, 2, 3),
        |sc AS (SELECT qid, doc_id, CAST(sum(mu) AS BIGINT) AS su
        |       FROM m GROUP BY 1, 2),
        |r AS (SELECT qid, doc_id, su,
        |             row_number() OVER (PARTITION BY qid
        |                                ORDER BY su DESC, doc_id) AS rk
        |      FROM sc)
        |SELECT qid, rk, doc_id, su / 10000.0 AS score
        |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    // mean pooling: per-element 6dp micro-units before the sum (exact
    // BIGINT totals), mean = one division of two exact integers
    "doc_semantic_search" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 100 = 0),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s DESC, nn_id)
        |               AS rk
        |      FROM d WHERE s IS NOT NULL)
        |SELECT r.qid, r.rk, r.nn_id, round(r.s, 4) AS score,
        |       doc.lang AS lang, doc.source AS source
        |FROM r JOIN documents doc ON r.nn_id = doc.doc_id
        |WHERE r.rk <= 5 ORDER BY r.qid, r.rk""".stripMargin,
  )
}
