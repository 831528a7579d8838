package graft

/** Ann-family oracle SQL — split verbatim from SparkEntry
  * (r12, r11 verdict #7). The registry stays in SparkEntry;
  * these maps are its DuckDB mirrors, byte-identical to the
  * pre-split strings.
  */
private[graft] object OracleAnn {
  import OracleCtes._

  val sql: Map[String, String] = Map(
    // IVFPQ (Pq.ivfPqSearch, k=10 nprobe=2 rerank=4, by_residual=false):
    // the IVF probe set over cells, an ADC-COSINE shortlist of 40 per
    // query within probed cells (VecCosinePqAdc's dot/norm fold), then
    // the exact cosine rerank.
    "ann_ivf_pq" ->
      s"""WITH $ivfCtes,
         |$pqCtes,
         |pd AS (SELECT pr.qid, a.id,
         |         list_inner_product(q.qv, r.rv)
         |           / (sqrt(list_inner_product(q.qv, q.qv))
         |              * sqrt(list_inner_product(r.rv, r.rv))) AS pcos
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |            JOIN q ON pr.qid = q.qid JOIN prec r ON a.id = r.id),
         |sl AS (SELECT qid, id FROM (SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY pcos DESC, id) AS rn
         |       FROM pd WHERE pcos IS NOT NULL) WHERE rn <= 40),
         |rr AS (SELECT sl.qid, sl.id, list_cosine_similarity(e.v, q.qv) AS s
         |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
         |rk AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rk
         |       FROM rr WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // OPQ-rotated IVFPQ (Pq.ivfOpqSearch): the greedy correlation-
    // grouping permutation (opqCtes → opl.pl), corpus and query
    // rotated by the same column shuffle, the verbatim PQ chain on
    // the rotated corpus (pqCtesSrc("erot")), ADC cosine in rotated
    // space, exact rerank on ORIGINAL vectors
    "ann_ivf_opq" ->
      s"""WITH $ivfCtes,
         |$opqCtes,
         |erot AS (SELECT e.id, list_transform(opl.pl, p -> e.v[p + 1]) AS v
         |         FROM e CROSS JOIN opl),
         |${pqCtesSrc("erot")},
         |qrot AS (SELECT q.qid, list_transform(opl.pl, p -> q.qv[p + 1]) AS qv
         |         FROM q CROSS JOIN opl),
         |pd AS (SELECT pr.qid, a.id,
         |         list_inner_product(qr.qv, r.rv)
         |           / (sqrt(list_inner_product(qr.qv, qr.qv))
         |              * sqrt(list_inner_product(r.rv, r.rv))) AS pcos
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |            JOIN qrot qr ON pr.qid = qr.qid JOIN prec r ON a.id = r.id),
         |sl AS (SELECT qid, id FROM (SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY pcos DESC, id) AS rn
         |       FROM pd WHERE pcos IS NOT NULL) WHERE rn <= 40),
         |rr AS (SELECT sl.qid, sl.id, list_cosine_similarity(e.v, q.qv) AS s
         |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
         |rk AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rk
         |       FROM rr WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // OPQ-vs-PQ search-axis report: both full pipelines (shared IVF
    // probes; plain PQ chain unprefixed, rotated chain under the 'o'
    // prefix) against the brute cosine top-10, one row per method
    "opq_recall_report" ->
      s"""WITH $ivfCtes,
         |${pqCtesSrc("e")},
         |$opqCtes,
         |erot AS (SELECT e.id, list_transform(opl.pl, p -> e.v[p + 1]) AS v
         |         FROM e CROSS JOIN opl),
         |${pqCtesSrc("erot", "o")},
         |qrot AS (SELECT q.qid, list_transform(opl.pl, p -> q.qv[p + 1]) AS qv
         |         FROM q CROSS JOIN opl),
         |pdp AS (SELECT pr.qid, a.id,
         |         list_inner_product(q.qv, r.rv)
         |           / (sqrt(list_inner_product(q.qv, q.qv))
         |              * sqrt(list_inner_product(r.rv, r.rv))) AS pcos
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |            JOIN q ON pr.qid = q.qid JOIN prec r ON a.id = r.id),
         |slp AS (SELECT qid, id FROM (SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY pcos DESC, id) AS rn
         |       FROM pdp WHERE pcos IS NOT NULL) WHERE rn <= 40),
         |rrp AS (SELECT slp.qid, slp.id, list_cosine_similarity(e.v, q.qv) AS s
         |       FROM slp JOIN e ON slp.id = e.id JOIN q ON slp.qid = q.qid),
         |ivp AS (SELECT qid, id FROM (SELECT qid, id,
         |          row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rk
         |        FROM rrp WHERE s IS NOT NULL) WHERE rk <= 10),
         |pdo AS (SELECT pr.qid, a.id,
         |         list_inner_product(qr.qv, r.rv)
         |           / (sqrt(list_inner_product(qr.qv, qr.qv))
         |              * sqrt(list_inner_product(r.rv, r.rv))) AS pcos
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |            JOIN qrot qr ON pr.qid = qr.qid
         |            JOIN oprec r ON a.id = r.id),
         |slo AS (SELECT qid, id FROM (SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY pcos DESC, id) AS rn
         |       FROM pdo WHERE pcos IS NOT NULL) WHERE rn <= 40),
         |rro AS (SELECT slo.qid, slo.id, list_cosine_similarity(e.v, q.qv) AS s
         |       FROM slo JOIN e ON slo.id = e.id JOIN q ON slo.qid = q.qid),
         |ivo AS (SELECT qid, id FROM (SELECT qid, id,
         |          row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rk
         |        FROM rro WHERE s IS NOT NULL) WHERE rk <= 10),
         |obd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv) AS s
         |        FROM e e2 CROSS JOIN q),
         |obf AS (SELECT qid, id FROM (SELECT qid, id,
         |          row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rk
         |        FROM obd WHERE s IS NOT NULL) WHERE rk <= 10),
         |onq AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
         |hp AS (SELECT CAST(count(*) AS BIGINT) AS hits
         |       FROM ivp JOIN obf ON ivp.qid = obf.qid AND ivp.id = obf.id),
         |ho AS (SELECT CAST(count(*) AS BIGINT) AS hits
         |       FROM ivo JOIN obf ON ivo.qid = obf.qid AND ivo.id = obf.id),
         |mrep AS (SELECT 'pq' AS method, hits FROM hp
         |         UNION ALL SELECT 'opq', hits FROM ho)
         |SELECT method, hits, round(hits / (onq.n * 10.0), 4) AS recall
         |FROM mrep CROSS JOIN onq ORDER BY method""".stripMargin,
    // residual IVFPQ (Pq.ivfPqResSearch, by_residual=true — the FAISS
    // default): PQ trained on float-round-tripped cell residuals,
    // per-(query, probed cell) query residual into the flat-fold L2
    // ADC, exact float L2 rerank
    "ann_ivf_pq_res" ->
      s"""WITH $ivfCtes,
         |er AS (SELECT af.id, list_transform(range(1, 65),
         |         j -> CAST(CAST(af.v[j] - cv.cv[j] AS FLOAT) AS DOUBLE))
         |         AS v
         |       FROM af JOIN c2 cv ON af.cell = cv.cell),
         |${pqCtesSrc("er")},
         |qr AS (SELECT pr.qid, pr.cell, list_transform(range(1, 65),
         |         j -> q.qv[j] - cv.cv[j]) AS qres
         |       FROM pr JOIN q ON pr.qid = q.qid
         |            JOIN c2 cv ON pr.cell = cv.cell),
         |ad AS (SELECT qr.qid, a.id,
         |         sqrt(${pqSqDist("qr.qres", "r.rv", 65)}) AS ad
         |       FROM af a JOIN qr ON a.cell = qr.cell
         |            JOIN prec r ON a.id = r.id),
         |sl AS (SELECT qid, id FROM (SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY ad, id) AS rn
         |       FROM ad WHERE ad IS NOT NULL) WHERE rn <= 40),
         |rr AS (SELECT sl.qid, sl.id, list_distance(e.v, q.qv) AS s
         |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
         |rk AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid ORDER BY s, id) AS rk
         |       FROM rr WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "ann_ivf" -> ivfOracle,
    // margin-gated spilled assignment, single-cell probe (the SOAR
    // trade, r12): first cell always; the second-cell replica only
    // when the boundary margin cd2 - cd1 < 0.4 (negated-cosine units,
    // the same cd both engines already order by)
    "ann_ivf_spill" ->
      s"""WITH $ivfCtes,
         |aspr AS (SELECT id, v, cell, cd, rn FROM (SELECT e.id, e.v, c.cell,
         |    ${ivfCd("e.v", "c.cv")} AS cd,
         |    row_number() OVER (PARTITION BY e.id
         |      ORDER BY ${ivfCd("e.v", "c.cv")}, c.cell) AS rn
         |  FROM e CROSS JOIN c2 c) WHERE rn <= 2),
         |mg AS (SELECT a.id, b.cd - a.cd AS margin
         |       FROM aspr a JOIN aspr b ON a.id = b.id
         |        AND a.rn = 1 AND b.rn = 2),
         |asp AS (SELECT id, v, cell FROM aspr WHERE rn = 1
         |        UNION ALL
         |        SELECT r.id, r.v, r.cell FROM aspr r
         |        JOIN mg ON r.id = mg.id AND r.rn = 2
         |        WHERE mg.margin < 0.4),
         |p1 AS (SELECT qid, cell FROM (SELECT q.qid, c.cell,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY ${ivfCd("q.qv", "c.cv")}, c.cell) AS rn
         |  FROM q CROSS JOIN c2 c) WHERE rn = 1),
         |spsc AS (SELECT p1.qid, a.id,
         |    list_cosine_similarity(a.v, q.qv) AS s
         |  FROM asp a JOIN p1 ON a.cell = p1.cell
         |  JOIN q ON p1.qid = q.qid),
         |spr AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |    ORDER BY s DESC, id) AS rk
         |  FROM spsc WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM spr WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // range search through the index: probed cells' members at
    // cosine >= 0.25 — no rank, no heap; subset-of-flat pinned in spec
    // range search through the index: probed cells' members at
    // cosine >= 0.25 — no rank, no heap; subset-of-flat pinned in spec
    "ann_ivf_range" ->
      s"""WITH $ivfCtes,
         |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv) AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell JOIN q ON pr.qid = q.qid)
         |SELECT qid, id AS nn_id, round(s, 4) AS score
         |FROM sc WHERE s IS NOT NULL AND s >= 0.25
         |ORDER BY qid, nn_id""".stripMargin,
    // per-request nprobe (FAISS's per-call effort knob as data): the
    // probe width is a per-qid row_number bound off the same clamp
    // expression the Spark side emits as nprobe_used
    "ann_ivf_nprobe" ->
      s"""WITH $ivfCtes,
         |qq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
         |         CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 3 END AS np
         |       FROM embeddings WHERE vec_id < 6),
         |prn AS (SELECT qid, np, cell FROM (SELECT qq.qid, qq.np, c.cell,
         |    row_number() OVER (PARTITION BY qq.qid
         |      ORDER BY ${ivfCd("qq.qv", "c.cv")}, c.cell) AS rn
         |  FROM qq CROSS JOIN c2 c) WHERE rn <= np),
         |sc AS (SELECT prn.qid, prn.np, a.id,
         |         list_cosine_similarity(a.v, qq.qv) AS s
         |       FROM af a JOIN prn ON a.cell = prn.cell
         |       JOIN qq ON prn.qid = qq.qid),
         |r AS (SELECT qid, np, id, s,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY s DESC, id) AS rk
         |       FROM sc WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score,
         |       CAST(np AS BIGINT) AS nprobe_used
         |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "ann_nsw" -> nswOracle,
    // filtered graph search: rank the filter-passing VISITED set
    // (bf0 ∪ bc1..3 — every id any beam round scored)
    // filtered graph search: rank the filter-passing VISITED set
    // (bf0 ∪ bc1..3 — every id any beam round scored)
    "ann_nsw_filtered" ->
      s"""WITH $ivfGraphCtes,
         |${nswBeamCtes("vec_id < 5")},
         |vis AS (SELECT DISTINCT qid, id FROM (
         |    SELECT qid, id FROM bf0 UNION ALL SELECT qid, id FROM bc1
         |    UNION ALL SELECT qid, id FROM bc2
         |    UNION ALL SELECT qid, id FROM bc3)),
         |alw AS (SELECT vec_id AS id FROM embeddings WHERE label = 5),
         |fsc AS (SELECT v.qid, v.id,
         |          list_cosine_similarity(e.v, qq.qv) AS s
         |        FROM vis v JOIN alw ON v.id = alw.id
         |             JOIN e ON v.id = e.id JOIN qq ON v.qid = qq.qid)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM fsc WHERE s IS NOT NULL)
         |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    "ann_hnsw" -> hnswOracle,
    // recall trio completion: hierarchical path vs the brute scan
    // recall trio completion: hierarchical path vs the brute scan
    "hnsw_recall_report" ->
      s"""WITH $ivfGraphCtes,
         |${hnswBeamCtes("vec_id < 5")},
         |hv AS (SELECT qid, id FROM (SELECT *, row_number() OVER (
         |         PARTITION BY qid ORDER BY s DESC, id) AS rk
         |       FROM hbf3) WHERE rk <= 10),
         |bd AS (SELECT qq.qid, e2.id,
         |         list_cosine_similarity(e2.v, qq.qv) AS s
         |       FROM e e2 CROSS JOIN qq),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |bff AS (SELECT qid, id FROM br WHERE rk <= 10),
         |h AS (SELECT hv.qid, CAST(count(*) AS BIGINT) AS hits
         |      FROM hv JOIN bff ON hv.qid = bff.qid AND hv.id = bff.id
         |      GROUP BY 1)
         |SELECT qid, hits, round(hits / 10.0, 4) AS recall
         |FROM h ORDER BY qid""".stripMargin,
    // persisted hierarchy: same centroids, same edge rule, searched
    // partition-pruned — shares the in-memory descent's mirror
    // (HnswIndexSpec pins the path equality)
    // persisted hierarchy: same centroids, same edge rule, searched
    // partition-pruned — shares the in-memory descent's mirror
    // (HnswIndexSpec pins the path equality)
    "ann_hnsw_indexed" -> hnswOracle,
    // filtered hierarchical search: rank the filter-passing VISITED
    // set of the whole descent (entry ∪ layer expands ∪ base expands)
    // filtered hierarchical search: rank the filter-passing VISITED
    // set of the whole descent (entry ∪ layer expands ∪ base expands)
    "ann_hnsw_filtered" ->
      s"""WITH $ivfGraphCtes,
         |${hnswBeamCtes("vec_id < 5")},
         |vis AS (SELECT DISTINCT qid, id FROM (
         |    SELECT qid, id FROM hf5 UNION ALL SELECT qid, id FROM hc4
         |    UNION ALL SELECT qid, id FROM hc3
         |    UNION ALL SELECT qid, id FROM hc2
         |    UNION ALL SELECT qid, id FROM hc1
         |    UNION ALL SELECT qid, id FROM hbc1
         |    UNION ALL SELECT qid, id FROM hbc2
         |    UNION ALL SELECT qid, id FROM hbc3)),
         |alw AS (SELECT vec_id AS id FROM embeddings WHERE label = 5),
         |fsc AS (SELECT v.qid, v.id,
         |          list_cosine_similarity(e.v, qq.qv) AS s
         |        FROM vis v JOIN alw ON v.id = alw.id
         |             JOIN e ON v.id = e.id JOIN qq ON v.qid = qq.qid)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM fsc WHERE s IS NOT NULL)
         |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    // corpus-wide kNN graph over the shared IVF chain, self excluded
    // SOAR trade: recall@10 + scan cost for ivf@p1 / ivf@p2 / full
    // spill@p1 / margin-gated spill@p1 (cd2-cd1 < 0.4, r12) over the
    // shared chain; hit counts vs brute top-10
    "ann_spill_recall" ->
      s"""WITH $ivfCtes,
         |p1 AS (SELECT qid, cell FROM (SELECT q.qid, c.cell,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY ${ivfCd("q.qv", "c.cv")}, c.cell) AS rn
         |  FROM q CROSS JOIN c2 c) WHERE rn = 1),
         |aspr AS (SELECT id, v, cell, cd, rn FROM (SELECT e.id, e.v, c.cell,
         |    ${ivfCd("e.v", "c.cv")} AS cd,
         |    row_number() OVER (PARTITION BY e.id
         |      ORDER BY ${ivfCd("e.v", "c.cv")}, c.cell) AS rn
         |  FROM e CROSS JOIN c2 c) WHERE rn <= 2),
         |asp AS (SELECT id, v, cell FROM aspr WHERE rn <= 2),
         |mg AS (SELECT a.id, b.cd - a.cd AS margin
         |       FROM aspr a JOIN aspr b ON a.id = b.id
         |        AND a.rn = 1 AND b.rn = 2),
         |asm AS (SELECT id, v, cell FROM aspr WHERE rn = 1
         |        UNION ALL
         |        SELECT r.id, r.v, r.cell FROM aspr r
         |        JOIN mg ON r.id = mg.id AND r.rn = 2
         |        WHERE mg.margin < 0.4),
         |nqx AS (SELECT CAST(count(*) AS BIGINT) AS nq FROM q),
         |xr AS (SELECT qid, id FROM (SELECT q.qid, e.id,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.id)
         |      AS rk
         |  FROM e CROSS JOIN q) WHERE rk <= 10),
         |r1 AS (SELECT qid, id FROM (SELECT p1.qid, a.id,
         |    row_number() OVER (PARTITION BY p1.qid
         |      ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.id)
         |      AS rk
         |  FROM af a JOIN p1 ON a.cell = p1.cell
         |  JOIN q ON p1.qid = q.qid
         |  WHERE list_cosine_similarity(a.v, q.qv) IS NOT NULL)
         |  WHERE rk <= 10),
         |r2 AS (SELECT qid, id FROM (SELECT pr.qid, a.id,
         |    row_number() OVER (PARTITION BY pr.qid
         |      ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.id)
         |      AS rk
         |  FROM af a JOIN pr ON a.cell = pr.cell
         |  JOIN q ON pr.qid = q.qid
         |  WHERE list_cosine_similarity(a.v, q.qv) IS NOT NULL)
         |  WHERE rk <= 10),
         |r3 AS (SELECT qid, id FROM (SELECT p1.qid, a.id,
         |    row_number() OVER (PARTITION BY p1.qid
         |      ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.id)
         |      AS rk
         |  FROM asp a JOIN p1 ON a.cell = p1.cell
         |  JOIN q ON p1.qid = q.qid
         |  WHERE list_cosine_similarity(a.v, q.qv) IS NOT NULL)
         |  WHERE rk <= 10),
         |h1 AS (SELECT CAST(count(*) AS BIGINT) AS h
         |       FROM r1 JOIN xr USING (qid, id)),
         |h2 AS (SELECT CAST(count(*) AS BIGINT) AS h
         |       FROM r2 JOIN xr USING (qid, id)),
         |h3 AS (SELECT CAST(count(*) AS BIGINT) AS h
         |       FROM r3 JOIN xr USING (qid, id)),
         |r4 AS (SELECT qid, id FROM (SELECT p1.qid, a.id,
         |    row_number() OVER (PARTITION BY p1.qid
         |      ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.id)
         |      AS rk
         |  FROM asm a JOIN p1 ON a.cell = p1.cell
         |  JOIN q ON p1.qid = q.qid
         |  WHERE list_cosine_similarity(a.v, q.qv) IS NOT NULL)
         |  WHERE rk <= 10),
         |h4 AS (SELECT CAST(count(*) AS BIGINT) AS h
         |       FROM r4 JOIN xr USING (qid, id)),
         |cs AS (SELECT cell, CAST(count(*) AS BIGINT) AS cn
         |       FROM af GROUP BY 1),
         |css AS (SELECT cell, CAST(count(*) AS BIGINT) AS cn
         |        FROM asp GROUP BY 1),
         |csm AS (SELECT cell, CAST(count(*) AS BIGINT) AS cn
         |        FROM asm GROUP BY 1),
         |s1 AS (SELECT CAST(sum(cn) AS BIGINT) AS sr
         |       FROM p1 JOIN cs USING (cell)),
         |s2 AS (SELECT CAST(sum(cn) AS BIGINT) AS sr
         |       FROM pr JOIN cs USING (cell)),
         |s3 AS (SELECT CAST(sum(cn) AS BIGINT) AS sr
         |       FROM p1 JOIN css USING (cell)),
         |s4 AS (SELECT CAST(sum(cn) AS BIGINT) AS sr
         |       FROM p1 JOIN csm USING (cell))
         |SELECT variant, n_queries, mean_recall, scanned_rows FROM (
         |  SELECT 'ivf_p1' AS variant, nq AS n_queries,
         |         round(CAST(h AS DOUBLE) / (10 * nq), 4) AS mean_recall,
         |         sr AS scanned_rows
         |  FROM h1, s1, nqx
         |  UNION ALL
         |  SELECT 'ivf_p2', nq, round(CAST(h AS DOUBLE) / (10 * nq), 4),
         |         sr
         |  FROM h2, s2, nqx
         |  UNION ALL
         |  SELECT 'spill_p1', nq, round(CAST(h AS DOUBLE) / (10 * nq), 4),
         |         sr
         |  FROM h3, s3, nqx
         |  UNION ALL
         |  SELECT 'spill_m1', nq, round(CAST(h AS DOUBLE) / (10 * nq), 4),
         |         sr
         |  FROM h4, s4, nqx)
         |ORDER BY variant""".stripMargin,
    // 2-core by unrolled peeling (8 rounds): the Spark side's exact
    // convergence stop makes extra mirror rounds the identity
    "ann_ivf_indexed" -> ivfOracle,
    // cluster dashboard over the SAME trained centroids: per-row
    // cosine 4dp-quantized to integer micro-units before the sums,
    // dominant label by (count DESC, label) argmax
    // recall@10 of the IVF path against brute force: both legs are
    // the existing deterministic mirrors, composed
    // recall-vs-nprobe curve: four probe widths over the SAME
    // trained chain, overall recall@10 against the brute scan
    // cost/recall frontier: the recall-curve blocks + probed-cell
    // size sums (the probe's scan cost) per width
    "ann_pareto_tuning" -> {
      val blocks = Seq(1, 2, 3, 4).map { np =>
        s"""pp$np AS (SELECT qid, cell FROM (SELECT q.qid, c.cell,
           |  row_number() OVER (PARTITION BY q.qid
           |    ORDER BY ${ivfCd("q.qv", "c.cv")}, c.cell) AS rn
           |  FROM q CROSS JOIN c2 c) WHERE rn <= $np),
           |ss$np AS (SELECT pp$np.qid, a.id,
           |    list_cosine_similarity(a.v, q.qv) AS s
           |  FROM af a JOIN pp$np ON a.cell = pp$np.cell
           |  JOIN q ON pp$np.qid = q.qid),
           |rr$np AS (SELECT qid, id FROM (SELECT qid, id,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY s DESC, id) AS rk
           |  FROM ss$np WHERE s IS NOT NULL) WHERE rk <= 10)""".stripMargin
      }.mkString(",\n")
      val unions = Seq(1, 2, 3, 4).map { np =>
        s"SELECT CAST($np AS BIGINT) AS nprobe, " +
          s"CAST((SELECT count(*) FROM rr$np JOIN bf " +
          s"ON rr$np.qid = bf.qid AND rr$np.id = bf.id) AS BIGINT) " +
          s"AS n_hits, " +
          s"CAST((SELECT sum(cs.csz) FROM pp$np " +
          s"JOIN cs ON pp$np.cell = cs.cell) AS BIGINT) AS nc"
      }.mkString("\nUNION ALL\n")
      s"""WITH $ivfCtes,
         |$blocks,
         |cs AS (SELECT cell, CAST(count(*) AS BIGINT) AS csz
         |       FROM af GROUP BY 1),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |bf AS (SELECT qid, id FROM br WHERE rk <= 10),
         |u AS ($unions)
         |SELECT nprobe, n_hits, round(n_hits / 50.0, 4) AS recall,
         |  nc AS n_candidates, round(nc / 5.0, 4) AS cand_per_query
         |FROM u ORDER BY nprobe""".stripMargin
    },
    // MRL curve: pure-prefix ranking per width vs the full-dim exact
    // scan; zero-hit widths kept by the left join
    // MRL curve: pure-prefix ranking per width vs the full-dim exact
    // scan; zero-hit widths kept by the left join
    "mrl_recall_curve" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
        |         AS s
        |       FROM e e2 CROSS JOIN q),
        |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
        |         ORDER BY s DESC, id) AS rk
        |       FROM bd WHERE s IS NOT NULL),
        |ex AS (SELECT qid, id FROM br WHERE rk <= 10),
        |dims AS (SELECT unnest([4, 8, 16, 32]) AS pd),
        |pl AS (SELECT dims.pd, q.qid, e2.id,
        |         list_cosine_similarity(e2.v[1:dims.pd],
        |           q.qv[1:dims.pd]) AS s
        |       FROM e e2 CROSS JOIN q CROSS JOIN dims),
        |pp AS (SELECT pd, qid, id, s,
        |         row_number() OVER (PARTITION BY pd, qid
        |                            ORDER BY s DESC, id) AS rk
        |       FROM pl WHERE s IS NOT NULL),
        |sys AS (SELECT pd, qid, id FROM pp WHERE rk <= 10),
        |hits AS (SELECT pd, CAST(count(*) AS BIGINT) AS n_hits
        |         FROM sys JOIN ex ON sys.qid = ex.qid AND sys.id = ex.id
        |         GROUP BY 1),
        |den AS (SELECT CAST(count(*) AS BIGINT) AS denom FROM ex)
        |SELECT CAST(dims.pd AS BIGINT) AS prefix_dims,
        |       CAST(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits,
        |       round(CAST(coalesce(hits.n_hits, 0) AS DOUBLE)
        |         / den.denom, 4) AS recall
        |FROM dims LEFT JOIN hits ON dims.pd = hits.pd CROSS JOIN den
        |ORDER BY prefix_dims""".stripMargin,
    // vector-space PSI between ingest waves over the shared IVF
    // cells; per-cell terms micro-rounded BIGINTs (order-free sum)
    "ann_recall_curve" -> {
      val blocks = Seq(1, 2, 3, 4).map { np =>
        s"""pp$np AS (SELECT qid, cell FROM (SELECT q.qid, c.cell,
           |  row_number() OVER (PARTITION BY q.qid
           |    ORDER BY ${ivfCd("q.qv", "c.cv")}, c.cell) AS rn
           |  FROM q CROSS JOIN c2 c) WHERE rn <= $np),
           |ss$np AS (SELECT pp$np.qid, a.id,
           |    list_cosine_similarity(a.v, q.qv) AS s
           |  FROM af a JOIN pp$np ON a.cell = pp$np.cell
           |  JOIN q ON pp$np.qid = q.qid),
           |rr$np AS (SELECT qid, id FROM (SELECT qid, id,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY s DESC, id) AS rk
           |  FROM ss$np WHERE s IS NOT NULL) WHERE rk <= 10)""".stripMargin
      }.mkString(",\n")
      val unions = Seq(1, 2, 3, 4).map { np =>
        s"SELECT CAST($np AS BIGINT) AS nprobe, " +
          s"CAST(count(*) AS BIGINT) AS n_hits " +
          s"FROM rr$np JOIN bf ON rr$np.qid = bf.qid AND rr$np.id = bf.id"
      }.mkString("\nUNION ALL\n")
      s"""WITH $ivfCtes,
         |$blocks,
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |bf AS (SELECT qid, id FROM br WHERE rk <= 10),
         |u AS ($unions)
         |SELECT nprobe, n_hits, round(n_hits / 50.0, 4) AS recall
         |FROM u ORDER BY nprobe""".stripMargin
    },
    // recall@k curve: both ranked lists once at k=10, per-k
    // rank-filtered joins; denominators k·|Q|
    // recall@k curve: both ranked lists once at k=10, per-k
    // rank-filtered joins; denominators k·|Q|
    "ann_recall_at_k" ->
      s"""WITH $ivfCtes,
         |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv) AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell JOIN q ON pr.qid = q.qid),
         |ir AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM sc WHERE s IS NOT NULL),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |u AS (
         |  SELECT CAST(1 AS BIGINT) AS k, CAST(count(*) AS BIGINT)
         |    AS n_hits
         |  FROM (SELECT qid, id FROM ir WHERE rk <= 1) a1
         |  JOIN (SELECT qid, id FROM br WHERE rk <= 1) b1 USING (qid, id)
         |  UNION ALL
         |  SELECT CAST(5 AS BIGINT), CAST(count(*) AS BIGINT)
         |  FROM (SELECT qid, id FROM ir WHERE rk <= 5) a5
         |  JOIN (SELECT qid, id FROM br WHERE rk <= 5) b5 USING (qid, id)
         |  UNION ALL
         |  SELECT CAST(10 AS BIGINT), CAST(count(*) AS BIGINT)
         |  FROM (SELECT qid, id FROM ir WHERE rk <= 10) a10
         |  JOIN (SELECT qid, id FROM br WHERE rk <= 10) b10 USING (qid, id))
         |SELECT k, n_hits, round(n_hits / (k * 5.0), 4) AS recall
         |FROM u ORDER BY k""".stripMargin,
    "ann_recall_report" ->
      s"""WITH $ivfCtes,
         |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv)
         |         AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |       JOIN q ON pr.qid = q.qid),
         |r AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM sc WHERE s IS NOT NULL),
         |iv AS (SELECT qid, id FROM r WHERE rk <= 10),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |bf AS (SELECT qid, id FROM br WHERE rk <= 10),
         |h AS (SELECT iv.qid, CAST(count(*) AS BIGINT) AS hits
         |      FROM iv JOIN bf ON iv.qid = bf.qid AND iv.id = bf.id
         |      GROUP BY 1)
         |SELECT qid, hits, round(hits / 10.0, 4) AS recall
         |FROM h ORDER BY qid""".stripMargin,
    // nDCG@10 of the IVF path: graded relevance 11−rank from the
    // exact cosine top-10, discounted by log2(rank+1) over the
    // system's own ordering; idcg from the exact list's own ranks
    // MRR legs share the ndcg oracle's system/exact scans; rr_top1
    // tracks the exact rank-1 item, rr_first_rel any exact-top-10
    // IVF+MRL: prefix-cosine shortlist of 40 over probed cells, exact
    // full-dim rerank (the vdb_knn_mrl mirror under the IVF probe set)
    "ann_ivf_mrl" ->
      s"""WITH $ivfCtes,
         |ps AS (SELECT pr.qid, a.id,
         |         list_cosine_similarity(a.v[1:16], q.qv[1:16]) AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |       JOIN q ON pr.qid = q.qid),
         |sr AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM ps WHERE s IS NOT NULL),
         |sl AS (SELECT qid, id FROM sr WHERE rk <= 40),
         |re AS (SELECT sl.qid, sl.id,
         |         list_cosine_similarity(e2.v, q.qv) AS s
         |       FROM sl JOIN e e2 ON sl.id = e2.id
         |       JOIN q ON sl.qid = q.qid),
         |r AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM re WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // recall@10 of plain sign-LSH vs brute force — the bucket-overlap
    // eval beside the IVF probe eval; same composed-mirror pattern
    // recall@10 of plain sign-LSH vs brute force — the bucket-overlap
    // eval beside the IVF probe eval; same composed-mirror pattern
    "lsh_recall_report" ->
      s"""WITH ${lshCtes(multiprobe = false)},
         |iv AS (SELECT qid, id FROM r WHERE rk <= 10),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |bf AS (SELECT qid, id FROM br WHERE rk <= 10),
         |h AS (SELECT iv.qid, CAST(count(*) AS BIGINT) AS hits
         |      FROM iv JOIN bf ON iv.qid = bf.qid AND iv.id = bf.id
         |      GROUP BY 1)
         |SELECT qid, hits, round(hits / 10.0, 4) AS recall
         |FROM h ORDER BY qid""".stripMargin,
    // event-transition matrix: per-user lag pairs, row-normalized
    // top paths: trigram sequences per user, counted then ranked over
    // the states³-sized path table
    // filtered indexed search: the same probe set, members restricted
    // by the metadata predicate BEFORE scoring (reference
    // filter_index.cc bitmaps under the approximate path)
    // adaptive filtered search: the PLANNER is mirrored too — the
    // oracle computes the same STATS-DRIVEN estimate (exact total +
    // md5-hash-sample match count scaled by 8, floored at 1 — the
    // planner sidecar's semantics) and gates the same two branch
    // CTEs on est·10 < total, so a branch-choice divergence is a
    // hash mismatch, not a silent plan difference
    "ann_adaptive_filter" ->
      s"""WITH $ivfCtes,
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM embeddings),
         |sm AS (SELECT vec_id, label FROM embeddings
         |       WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
         |         1, 15) AS BIGINT) % 8 = 0),
         |nc AS (SELECT greatest(CAST(count(*) * 8 AS BIGINT), 1) AS c
         |       FROM sm WHERE label = 5 AND vec_id % 4 = 0),
         |bc AS (SELECT greatest(CAST(count(*) * 8 AS BIGINT), 1) AS c
         |       FROM sm WHERE label BETWEEN 2 AND 6),
         |nbd AS (SELECT q.qid, e2.vec_id AS nn_id,
         |          list_cosine_similarity(e2.embedding::DOUBLE[], q.qv) AS s
         |        FROM embeddings e2 CROSS JOIN q
         |        WHERE e2.label = 5 AND e2.vec_id % 4 = 0),
         |nbr AS (SELECT qid, nn_id, s, row_number() OVER (
         |          PARTITION BY qid ORDER BY s DESC, nn_id) AS rk
         |        FROM nbd WHERE s IS NOT NULL),
         |nfl AS (SELECT a.id, a.v, a.cell FROM af a
         |        JOIN embeddings em ON a.id = em.vec_id
         |        WHERE em.label = 5 AND em.vec_id % 4 = 0),
         |nsc AS (SELECT pr.qid, f.id, list_cosine_similarity(f.v, q.qv) AS s
         |        FROM nfl f JOIN pr ON f.cell = pr.cell
         |        JOIN q ON pr.qid = q.qid),
         |nir AS (SELECT qid, id, s, row_number() OVER (
         |          PARTITION BY qid ORDER BY s DESC, id) AS rk
         |        FROM nsc WHERE s IS NOT NULL),
         |bbd AS (SELECT q.qid, e2.vec_id AS nn_id,
         |          list_cosine_similarity(e2.embedding::DOUBLE[], q.qv) AS s
         |        FROM embeddings e2 CROSS JOIN q
         |        WHERE e2.label BETWEEN 2 AND 6),
         |bbr AS (SELECT qid, nn_id, s, row_number() OVER (
         |          PARTITION BY qid ORDER BY s DESC, nn_id) AS rk
         |        FROM bbd WHERE s IS NOT NULL),
         |bfl AS (SELECT a.id, a.v, a.cell FROM af a
         |        JOIN embeddings em ON a.id = em.vec_id
         |        WHERE em.label BETWEEN 2 AND 6),
         |bsc AS (SELECT pr.qid, f.id, list_cosine_similarity(f.v, q.qv) AS s
         |        FROM bfl f JOIN pr ON f.cell = pr.cell
         |        JOIN q ON pr.qid = q.qid),
         |bir AS (SELECT qid, id, s, row_number() OVER (
         |          PARTITION BY qid ORDER BY s DESC, id) AS rk
         |        FROM bsc WHERE s IS NOT NULL)
         |SELECT 'narrow' AS pred, 'prefilter_exact' AS strategy,
         |       qid, rk, nn_id, round(s, 4) AS score
         |FROM nbr CROSS JOIN nc CROSS JOIN tt
         |WHERE rk <= 10 AND c * 10 < t
         |UNION ALL
         |SELECT 'narrow', 'ivf_filtered', qid, rk, id, round(s, 4)
         |FROM nir CROSS JOIN nc CROSS JOIN tt
         |WHERE rk <= 10 AND c * 10 >= t
         |UNION ALL
         |SELECT 'broad', 'prefilter_exact', qid, rk, nn_id, round(s, 4)
         |FROM bbr CROSS JOIN bc CROSS JOIN tt
         |WHERE rk <= 10 AND c * 10 < t
         |UNION ALL
         |SELECT 'broad', 'ivf_filtered', qid, rk, id, round(s, 4)
         |FROM bir CROSS JOIN bc CROSS JOIN tt
         |WHERE rk <= 10 AND c * 10 >= t
         |ORDER BY pred, qid, rk""".stripMargin,
    "ann_ivf_filtered" ->
      s"""WITH $ivfCtes,
         |fl AS (SELECT a.id, a.v, a.cell FROM af a
         |       JOIN embeddings em ON a.id = em.vec_id
         |       WHERE em.label BETWEEN 2 AND 6),
         |sc AS (SELECT pr.qid, f.id, list_cosine_similarity(f.v, q.qv) AS s
         |       FROM fl f JOIN pr ON f.cell = pr.cell
         |            JOIN q ON pr.qid = q.qid),
         |r AS (SELECT qid, id, s,
         |             row_number() OVER (PARTITION BY qid ORDER BY s DESC, id)
         |               AS rk
         |      FROM sc WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // radius search (Knn.radius, cosine >= 0.25): plain filter over
    // the scored pairs, no top-k
    // IVF+SQ8 (Ann.ivfSq8Search, k=10 nprobe=2 rerank=4): the same
    // probe set, a code-space COSINE shortlist of 40 per query over
    // probed cells (codes decoded x = mn + c·(mx-mn)/255, the
    // VecCosineQ8 arithmetic), then the exact float rerank. The
    // encode grid mirrors vdb_knn_sq8's (round clamp 0..255).
    "ann_ivf_sq8" ->
      s"""WITH $ivfCtes,
         |dims AS (SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
         |         FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
         |mm AS (SELECT list(mn ORDER BY i) AS mns,
         |              list(mx ORDER BY i) AS mxs FROM dims),
         |codes AS (SELECT id, cell, list_transform(range(1, 65), i ->
         |            CASE WHEN mm.mxs[i] - mm.mns[i] <= 0 THEN 0
         |                 ELSE least(255, greatest(0,
         |                   round((t.v[i] - mm.mns[i])
         |                     / (mm.mxs[i] - mm.mns[i]) * 255))) END) AS c
         |          FROM af t, mm),
         |qcodes AS (SELECT qid, list_transform(range(1, 65), i ->
         |            CASE WHEN mm.mxs[i] - mm.mns[i] <= 0 THEN 0
         |                 ELSE least(255, greatest(0,
         |                   round((qv[i] - mm.mns[i])
         |                     / (mm.mxs[i] - mm.mns[i]) * 255))) END) AS qc
         |           FROM q, mm),
         |dq AS (SELECT pr.qid, co.id,
         |         list_transform(range(1, 65), i ->
         |           mm.mns[i] + co.c[i] * ((mm.mxs[i] - mm.mns[i]) / 255)) AS xs,
         |         list_transform(range(1, 65), i ->
         |           mm.mns[i] + qc.qc[i] * ((mm.mxs[i] - mm.mns[i]) / 255)) AS ys
         |       FROM codes co JOIN pr ON co.cell = pr.cell
         |            JOIN qcodes qc ON pr.qid = qc.qid, mm),
         |q8 AS (SELECT qid, id,
         |         list_inner_product(xs, ys)
         |           / (sqrt(list_inner_product(xs, xs))
         |              * sqrt(list_inner_product(ys, ys))) AS qcos
         |       FROM dq),
         |sl AS (SELECT qid, id FROM (
         |         SELECT qid, id,
         |                row_number() OVER (PARTITION BY qid
         |                                   ORDER BY qcos DESC, id) AS r
         |         FROM q8 WHERE qcos IS NOT NULL) WHERE r <= 40),
         |rr AS (SELECT sl.qid, sl.id, list_cosine_similarity(e.v, q.qv) AS s
         |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
         |rk AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, id) AS rk
         |       FROM rr WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // binary codes under IVF: the vdb_knn_bq pack/Hamming mirror
    // composed with the IVF train+assign+probe mirror; means trained
    // on the whole corpus, codes carried per assigned row
    // binary codes under IVF: the vdb_knn_bq pack/Hamming mirror
    // composed with the IVF train+assign+probe mirror; means trained
    // on the whole corpus, codes carried per assigned row
    "ann_ivf_bq" ->
      s"""WITH $ivfCtes,
         |dims AS (SELECT i, round(avg(v[i]), 6) AS mu
         |         FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
         |mus AS (SELECT list(mu ORDER BY i) AS m FROM dims),
         |codes AS (SELECT id, cell, list_transform(range(0, 2), w ->
         |            CAST(list_sum(list_transform(range(1, 33), j ->
         |              CASE WHEN t.v[CAST(w * 32 + j AS INT)]
         |                        > mus.m[CAST(w * 32 + j AS INT)]
         |                   THEN CAST(1 AS BIGINT) << CAST(j - 1 AS INT)
         |                   ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS c
         |          FROM af t, mus),
         |qcodes AS (SELECT qid, list_transform(range(0, 2), w ->
         |            CAST(list_sum(list_transform(range(1, 33), j ->
         |              CASE WHEN qv[CAST(w * 32 + j AS INT)]
         |                        > mus.m[CAST(w * 32 + j AS INT)]
         |                   THEN CAST(1 AS BIGINT) << CAST(j - 1 AS INT)
         |                   ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS qc
         |           FROM q, mus),
         |h AS (SELECT pr.qid, co.id,
         |        CAST(bit_count(xor(co.c[1], qc.qc[1])) AS BIGINT)
         |      + CAST(bit_count(xor(co.c[2], qc.qc[2])) AS BIGINT) AS hd
         |      FROM codes co JOIN pr ON co.cell = pr.cell
         |           JOIN qcodes qc ON pr.qid = qc.qid),
         |sl AS (SELECT qid, id FROM (
         |         SELECT qid, id,
         |                row_number() OVER (PARTITION BY qid
         |                                   ORDER BY hd, id) AS r
         |         FROM h) WHERE r <= 40),
         |rr AS (SELECT sl.qid, sl.id, list_cosine_similarity(e.v, q.qv) AS s
         |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
         |rk AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, id) AS rk
         |       FROM rr WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // sign-LSH (Ann.lshSearch, 4 tables × 4 bits): hyperplane
    // components from md5("t|p|d") exactly as dedup_embedding_cos's
    // oracle; candidates share any (table, sig) bucket with the
    // query; exact cosine rerank top-10.
    // sign-LSH (Ann.lshSearch, 4 tables × 4 bits): hyperplane
    // components from md5("t|p|d") exactly as dedup_embedding_cos's
    // oracle; candidates share any (table, sig) bucket with the
    // query; exact cosine rerank top-10.
    "ann_lsh" -> lshOracle(multiprobe = false),
    // multi-probe: the query's own bucket PLUS the 4 buckets one
    // sign-flip away in each table (Ann.lshSearchMultiprobe)
    // multi-probe: the query's own bucket PLUS the 4 buckets one
    // sign-flip away in each table (Ann.lshSearchMultiprobe)
    "ann_lsh_multiprobe" -> lshOracle(multiprobe = true),
  )
}
