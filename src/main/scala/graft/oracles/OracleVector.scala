package graft

/** Vector-family oracle SQL — split verbatim from SparkEntry
  * (r12, r11 verdict #7). The registry stays in SparkEntry;
  * these maps are its DuckDB mirrors, byte-identical to the
  * pre-split strings.
  */
private[graft] object OracleVector {
  import OracleCtes._

  val sql: Map[String, String] = Map(
    // flat PQ (Pq.pqSearchWith, k=10 rerank=4): LUT-ADC shortlist of
    // 40 per query (per-(sub, codeword) squared partials, summed
    // across subspaces in sub order — the VecL2PqLut fold), exact
    // float L2 rerank
    "vdb_knn_pq" ->
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
         |$pqCtes,
         |plut AS (SELECT q.qid, cb.sub, cb.cid,
         |           list_inner_product(
         |             list_transform(range(1, 9), j -> q.qv[cb.sub*8 + j] - cb.cw[j]),
         |             list_transform(range(1, 9), j -> q.qv[cb.sub*8 + j] - cb.cw[j]))
         |             AS lv
         |         FROM pcb2 cb CROSS JOIN q),
         |ad AS (SELECT p.qid, a.id,
         |              sqrt(list_sum(list(p.lv ORDER BY p.sub))) AS ad
         |       FROM paf a JOIN plut p ON a.sub = p.sub AND a.cid = p.cid
         |       GROUP BY p.qid, a.id),
         |sl AS (SELECT qid, id FROM (SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY ad, id) AS r
         |       FROM ad) WHERE r <= 40),
         |rr AS (SELECT sl.qid, sl.id, list_distance(e.v, q.qv) AS s
         |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
         |rk AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid ORDER BY s, id) AS rk
         |       FROM rr WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // IVFPQ (Pq.ivfPqSearch, k=10 nprobe=2 rerank=4, by_residual=false):
    // the IVF probe set over cells, an ADC-COSINE shortlist of 40 per
    // query within probed cells (VecCosinePqAdc's dot/norm fold), then
    // the exact cosine rerank.
    // MRL prefix-dim search: cosine over the first 16 dims shortlists
    // 40, exact full-dim cosine reranks to 10 (DuckDB list slice
    // v[1:16] = Spark slice(vec, 1, 16))
    "vdb_knn_mrl" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |ps AS (SELECT q.qid, e.id,
        |              list_cosine_similarity(e.v[1:16], q.qv[1:16]) AS s
        |       FROM e CROSS JOIN q),
        |sr AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
        |         ORDER BY s DESC, id) AS rk
        |       FROM ps WHERE s IS NOT NULL),
        |sl AS (SELECT qid, id FROM sr WHERE rk <= 40),
        |re AS (SELECT sl.qid, sl.id,
        |              list_cosine_similarity(e.v, q.qv) AS s
        |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
        |r AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
        |        ORDER BY s DESC, id) AS rk
        |      FROM re WHERE s IS NOT NULL)
        |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // IVF+MRL: prefix-cosine shortlist of 40 over probed cells, exact
    // full-dim rerank (the vdb_knn_mrl mirror under the IVF probe set)
    // radius search (Knn.radius, cosine >= 0.25): plain filter over
    // the scored pairs, no top-k
    "vdb_range_search" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q)
        |SELECT qid, nn_id, round(s, 4) AS score
        |FROM d WHERE s IS NOT NULL AND s >= 0.25
        |ORDER BY qid, nn_id""".stripMargin,
    // annulus range search: Milvus' radius + range_filter pair —
    // cosine in (0.25, 0.6], the related-but-not-a-copy band
    "vdb_range_annulus" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q)
        |SELECT qid, nn_id, round(s, 4) AS score
        |FROM d WHERE s IS NOT NULL AND s > 0.25 AND s <= 0.6
        |ORDER BY qid, nn_id""".stripMargin,
    // random-sampling API: seeded bottom-25 of md5('smp1|'||id) mod
    // 2^50 over the filtered collection — deterministic "random"
    "vdb_sample_random" ->
      """WITH h AS (SELECT vec_id AS id,
        |    CAST('0x' || substr(md5('smp1|' || CAST(vec_id AS VARCHAR)),
        |      1, 15) AS BIGINT) % 1125899906842624 AS h50
        |  FROM embeddings WHERE label >= 5),
        |r AS (SELECT id, h50,
        |        row_number() OVER (ORDER BY h50, id) AS rk
        |      FROM h)
        |SELECT rk, id, h50 FROM r WHERE rk <= 25 ORDER BY rk""".stripMargin,
    // IVF+SQ8 (Ann.ivfSq8Search, k=10 nprobe=2 rerank=4): the same
    // probe set, a code-space COSINE shortlist of 40 per query over
    // probed cells (codes decoded x = mn + c·(mx-mn)/255, the
    // VecCosineQ8 arithmetic), then the exact float rerank. The
    // encode grid mirrors vdb_knn_sq8's (round clamp 0..255).
    // vdb_knn_sq8 is oracled despite being "approximate": the
    // quantization grid, the shortlist rule (top-40 by code-space L2,
    // ties by id), and the exact rerank are all deterministic pure
    // functions DuckDB replicates bit-for-bit — integer-literal
    // arithmetic only (DuckDB decimal literals would silently switch
    // the math to DECIMAL), same operation order, same sequential
    // list_sum fold as the codegen loop's accumulator.
    "vdb_knn_sq8" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |dims AS (SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
        |         FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
        |mm AS (SELECT list(mn ORDER BY i) AS mns,
        |              list(mx ORDER BY i) AS mxs FROM dims),
        |codes AS (SELECT id, list_transform(range(1, 65), i ->
        |            CASE WHEN mm.mxs[i] - mm.mns[i] <= 0 THEN 0
        |                 ELSE least(255, greatest(0,
        |                   round((v[i] - mm.mns[i])
        |                     / (mm.mxs[i] - mm.mns[i]) * 255))) END) AS c
        |          FROM e, mm),
        |qcodes AS (SELECT qid, list_transform(range(1, 65), i ->
        |            CASE WHEN mm.mxs[i] - mm.mns[i] <= 0 THEN 0
        |                 ELSE least(255, greatest(0,
        |                   round((qv[i] - mm.mns[i])
        |                     / (mm.mxs[i] - mm.mns[i]) * 255))) END) AS qc
        |           FROM q, mm),
        |q8 AS (SELECT qc.qid, c.id,
        |         sqrt(list_sum(list_transform(
        |           list_transform(range(1, 65), i ->
        |             (qc.qc[i] - c.c[i])
        |               * ((mm.mxs[i] - mm.mns[i]) / 255)),
        |           d -> d * d))) AS qd
        |       FROM codes c, qcodes qc, mm),
        |sl AS (SELECT qid, id FROM (
        |         SELECT qid, id,
        |                row_number() OVER (PARTITION BY qid
        |                                   ORDER BY qd, id) AS r
        |         FROM q8) WHERE r <= 40),
        |rr AS (SELECT sl.qid, sl.id AS nn_id,
        |              list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |       FROM sl JOIN embeddings e ON sl.id = e.vec_id
        |               JOIN q ON sl.qid = q.qid),
        |rk AS (SELECT qid, nn_id, s,
        |              row_number() OVER (PARTITION BY qid
        |                                 ORDER BY s, nn_id) AS rk
        |       FROM rr)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // vdb_knn_bq mirrors the same shortlist-then-rerank recipe with
    // integer code space: the pack is a sum of 1::BIGINT << j terms
    // over 32-bit words (bit 63 would overflow signed 64-bit — the
    // Spark side packs 32 bits/word for exactly this mirror), the
    // 6dp-rounded per-dim means match the Spark training, and the
    // Hamming shortlist compares exact integers, so the only float
    // arithmetic the hash sees is the exact cosine rerank.
    // vdb_knn_bq mirrors the same shortlist-then-rerank recipe with
    // integer code space: the pack is a sum of 1::BIGINT << j terms
    // over 32-bit words (bit 63 would overflow signed 64-bit — the
    // Spark side packs 32 bits/word for exactly this mirror), the
    // 6dp-rounded per-dim means match the Spark training, and the
    // Hamming shortlist compares exact integers, so the only float
    // arithmetic the hash sees is the exact cosine rerank.
    "vdb_knn_bq" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |dims AS (SELECT i, round(avg(v[i]), 6) AS mu
        |         FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
        |mus AS (SELECT list(mu ORDER BY i) AS m FROM dims),
        |codes AS (SELECT id, list_transform(range(0, 2), w ->
        |            CAST(list_sum(list_transform(range(1, 33), j ->
        |              CASE WHEN v[CAST(w * 32 + j AS INT)]
        |                        > mus.m[CAST(w * 32 + j AS INT)]
        |                   THEN CAST(1 AS BIGINT) << CAST(j - 1 AS INT)
        |                   ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS c
        |          FROM e, mus),
        |qcodes AS (SELECT qid, list_transform(range(0, 2), w ->
        |            CAST(list_sum(list_transform(range(1, 33), j ->
        |              CASE WHEN qv[CAST(w * 32 + j AS INT)]
        |                        > mus.m[CAST(w * 32 + j AS INT)]
        |                   THEN CAST(1 AS BIGINT) << CAST(j - 1 AS INT)
        |                   ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS qc
        |           FROM q, mus),
        |h AS (SELECT qc.qid, c.id,
        |        CAST(bit_count(xor(c.c[1], qc.qc[1])) AS BIGINT)
        |      + CAST(bit_count(xor(c.c[2], qc.qc[2])) AS BIGINT) AS hd
        |      FROM codes c, qcodes qc),
        |sl AS (SELECT qid, id FROM (
        |         SELECT qid, id,
        |                row_number() OVER (PARTITION BY qid
        |                                   ORDER BY hd, id) AS r
        |         FROM h) WHERE r <= 40),
        |rr AS (SELECT sl.qid, sl.id AS nn_id,
        |              list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        |       FROM sl JOIN embeddings e ON sl.id = e.vec_id
        |               JOIN q ON sl.qid = q.qid),
        |rk AS (SELECT qid, nn_id, s,
        |              row_number() OVER (PARTITION BY qid
        |                                 ORDER BY s DESC, nn_id) AS rk
        |       FROM rr)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_knn_filtered_2field" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q
        |      WHERE e.label BETWEEN 2 AND 6 AND e.vec_id % 2 = 0),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // the decode is a REAL ImageIO PNG round-trip; the oracle
    // rebuilds the expected raster (flat fill, dims and color
    // derived from doc_id + byte length — Multimodal.fixtureDims)
    // and predicts its md5, so a checksum match proves the pixels
    // actually went through the codec and came back exact
    // request-batch dispatch: metric and filter are per-request DATA
    // (the reference's /search payload); ordering key is the
    // request's own metric, filter evaluated as a predicate
    "vdb_search_requests" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
        |             CASE WHEN vec_id % 2 = 0 THEN 10 ELSE 5 END AS k,
        |             CASE WHEN vec_id % 3 = 0 THEN 'L2'
        |                  WHEN vec_id % 3 = 1 THEN 'IP'
        |                  ELSE 'L1' END AS metric,
        |             CASE WHEN vec_id % 3 = 0 THEN '='
        |                  WHEN vec_id % 3 = 1 THEN '!=' END AS fop,
        |             5 AS fval
        |      FROM embeddings WHERE vec_id < 6),
        |d AS (SELECT q.qid, q.metric, q.k, e.id AS nn_id,
        |             CASE WHEN q.metric = 'L2' THEN list_distance(e.v, q.qv)
        |                  WHEN q.metric = 'L1' THEN
        |                    list_sum(list_transform(range(1, len(q.qv) + 1),
        |                      i -> abs(e.v[i] - q.qv[i])))
        |                  ELSE list_inner_product(e.v, q.qv) END AS s
        |      FROM e CROSS JOIN q
        |      WHERE q.fop IS NULL OR (q.fop = '=' AND e.label = q.fval)
        |         OR (q.fop = '!=' AND e.label <> q.fval)),
        |r AS (SELECT qid, nn_id, s, k,
        |             row_number() OVER (PARTITION BY qid ORDER BY
        |               CASE WHEN metric IN ('L2', 'L1') THEN s
        |                    ELSE -s END, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= k ORDER BY qid, rk""".stripMargin,
    // per-request index routing (SearchApi.searchRouted): even qids
    // take the exact FLAT leg (per-request metric/k/filter), qid≡1
    // (mod 4) the IVF probe leg, qid≡3 (mod 4) the HNSW-analog NSW
    // beam leg. ALL legs share the graph chain's training CTEs
    // (ivfGraphCtes computes assignments + probes for every vector;
    // per-qid ranking makes its probe set a superset of the ivf
    // chain's, so restricting pr by qid parity is exact)
    // per-request index routing (SearchApi.searchRouted): even qids
    // take the exact FLAT leg (per-request metric/k/filter), qid≡1
    // (mod 4) the IVF probe leg, qid≡3 (mod 4) the HNSW-analog NSW
    // beam leg. ALL legs share the graph chain's training CTEs
    // (ivfGraphCtes computes assignments + probes for every vector;
    // per-qid ranking makes its probe set a superset of the ivf
    // chain's, so restricting pr by qid parity is exact)
    "vdb_search_routed" ->
      s"""WITH $ivfGraphCtes,
         |el AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
         |       FROM embeddings),
         |fq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
         |              CASE WHEN vec_id % 3 = 0 THEN 10 ELSE 5 END AS k,
         |              CASE WHEN vec_id % 4 = 2 THEN 'IP'
         |                   ELSE 'L2' END AS metric,
         |              CASE WHEN vec_id = 4 THEN '='
         |                   WHEN vec_id = 2 THEN '!=' END AS fop,
         |              5 AS fval
         |       FROM embeddings WHERE vec_id < 8 AND vec_id % 2 = 0),
         |fd AS (SELECT fq.qid, fq.metric, fq.k, el.id AS nn_id,
         |              CASE WHEN fq.metric = 'L2'
         |                   THEN list_distance(el.v, fq.qv)
         |                   ELSE list_inner_product(el.v, fq.qv) END AS s
         |       FROM el CROSS JOIN fq
         |       WHERE fq.fop IS NULL OR (fq.fop = '=' AND el.label = fq.fval)
         |          OR (fq.fop = '!=' AND el.label <> fq.fval)),
         |fr AS (SELECT qid, nn_id, s, k,
         |              row_number() OVER (PARTITION BY qid ORDER BY
         |                CASE WHEN metric = 'L2' THEN s ELSE -s END, nn_id)
         |                AS rk
         |       FROM fd),
         |fl AS (SELECT qid, rk, nn_id, round(s, 4) AS score
         |       FROM fr WHERE rk <= k),
         |isc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv) AS s
         |        FROM af a JOIN pr ON a.cell = pr.cell
         |             JOIN q ON pr.qid = q.qid
         |        WHERE pr.qid < 8 AND pr.qid % 4 = 1),
         |ir AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid
         |                ORDER BY s DESC, id) AS rk
         |       FROM isc WHERE s IS NOT NULL),
         |il AS (SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |       FROM ir
         |       WHERE rk <= CASE WHEN qid % 3 = 0 THEN 10 ELSE 5 END),
         |${nswBeamCtes("vec_id = 3")},
         |hl AS (SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |       FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |               ORDER BY s DESC, id) AS rk FROM bf3)
         |       WHERE rk <= CASE WHEN qid % 3 = 0 THEN 10 ELSE 5 END),
         |${hnswBeamCtes("vec_id = 7", emitBase = false, qq = "hq")},
         |hil AS (SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |       FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |               ORDER BY s DESC, id) AS rk FROM hbf3)
         |       WHERE rk <= CASE WHEN qid % 3 = 0 THEN 10 ELSE 5 END)
         |SELECT qid, rk, nn_id, score
         |FROM (SELECT * FROM fl UNION ALL SELECT * FROM il
         |      UNION ALL SELECT * FROM hl UNION ALL SELECT * FROM hil)
         |ORDER BY qid, rk""".stripMargin,
    // per-request ef_search (hnswlib_index.h:16, setEf at
    // hnswlib_index.cc:30): even qids FLAT (rounds_used 0), odd qids
    // the NSW beam leg with a per-request round budget ⌈ef/16⌉ —
    // ef=16 (qid≡1 mod 4) runs ONE round (the xbf1 chain), ef=48
    // (qid≡3) the full three (ybf3). Per-class chains are exact
    // because per-query trajectories are qid-partitioned — the Spark
    // side's single gated loop computes the identical prefix.
    // per-request ef_search (hnswlib_index.h:16, setEf at
    // hnswlib_index.cc:30): even qids FLAT (rounds_used 0), odd qids
    // the NSW beam leg with a per-request round budget ⌈ef/16⌉ —
    // ef=16 (qid≡1 mod 4) runs ONE round (the xbf1 chain), ef=48
    // (qid≡3) the full three (ybf3). Per-class chains are exact
    // because per-query trajectories are qid-partitioned — the Spark
    // side's single gated loop computes the identical prefix.
    "vdb_search_routed_ef" ->
      s"""WITH $ivfGraphCtes,
         |el AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
         |       FROM embeddings),
         |fq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
         |              CASE WHEN vec_id % 3 = 0 THEN 10 ELSE 5 END AS k,
         |              CASE WHEN vec_id % 4 = 2 THEN 'IP'
         |                   ELSE 'L2' END AS metric,
         |              CASE WHEN vec_id = 4 THEN '='
         |                   WHEN vec_id = 2 THEN '!=' END AS fop,
         |              5 AS fval
         |       FROM embeddings WHERE vec_id < 8 AND vec_id % 2 = 0),
         |fd AS (SELECT fq.qid, fq.metric, fq.k, el.id AS nn_id,
         |              CASE WHEN fq.metric = 'L2'
         |                   THEN list_distance(el.v, fq.qv)
         |                   ELSE list_inner_product(el.v, fq.qv) END AS s
         |       FROM el CROSS JOIN fq
         |       WHERE fq.fop IS NULL OR (fq.fop = '=' AND el.label = fq.fval)
         |          OR (fq.fop = '!=' AND el.label <> fq.fval)),
         |fr AS (SELECT qid, nn_id, s, k,
         |              row_number() OVER (PARTITION BY qid ORDER BY
         |                CASE WHEN metric = 'L2' THEN s ELSE -s END, nn_id)
         |                AS rk
         |       FROM fd),
         |fl AS (SELECT qid, rk, nn_id, round(s, 4) AS score,
         |              CAST(0 AS BIGINT) AS rounds_used
         |       FROM fr WHERE rk <= k),
         |${nswBeamCtes("vec_id < 8 AND vec_id % 4 = 1", pfx = "x",
            rounds = 1)},
         |${nswBeamCtes("vec_id < 8 AND vec_id % 4 = 3", pfx = "y",
            rounds = 3, emitBase = false)},
         |xl AS (SELECT qid, rk, id AS nn_id, round(s, 4) AS score,
         |              CAST(1 AS BIGINT) AS rounds_used
         |       FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |               ORDER BY s DESC, id) AS rk FROM xbf1)
         |       WHERE rk <= CASE WHEN qid % 3 = 0 THEN 10 ELSE 5 END),
         |yl AS (SELECT qid, rk, id AS nn_id, round(s, 4) AS score,
         |              CAST(3 AS BIGINT) AS rounds_used
         |       FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |               ORDER BY s DESC, id) AS rk FROM ybf3)
         |       WHERE rk <= CASE WHEN qid % 3 = 0 THEN 10 ELSE 5 END)
         |SELECT qid, rk, nn_id, score, rounds_used
         |FROM (SELECT * FROM fl UNION ALL SELECT * FROM xl
         |      UNION ALL SELECT * FROM yl)
         |ORDER BY qid, rk""".stripMargin,
    "vdb_knn_flat_l2" -> knnOracle("l2"),
    "vdb_knn_flat_ip" -> knnOracle("ip"),
    "vdb_knn_flat_l1" -> knnOracle("l1"),
    "vdb_knn_flat_linf" -> knnOracle("linf"),
    // freshness decay: boosted = ((1+cos)/2) / 2^(id%4) — the shift
    // to [0,1] keeps the decay monotone for negative cosines (a raw
    // negative divided by 2^b would move TOWARD zero, promoting the
    // stale match); the power-of-two divide only shifts the exponent,
    // exact on both engines
    // freshness decay: boosted = ((1+cos)/2) / 2^(id%4) — the shift
    // to [0,1] keeps the decay monotone for negative cosines (a raw
    // negative divided by 2^b would move TOWARD zero, promoting the
    // stale match); the power-of-two divide only shifts the exponent,
    // exact on both engines
    "vdb_knn_recency_boost" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qv)
        |          AS c,
        |        e.vec_id % 4 AS bucket
        |      FROM embeddings e CROSS JOIN q),
        |s AS (SELECT qid, nn_id, c,
        |        ((c + 1) / 2)
        |          / CAST(1::BIGINT << CAST(bucket AS INTEGER) AS DOUBLE)
        |          AS dec
        |      FROM d WHERE c IS NOT NULL),
        |r AS (SELECT qid, nn_id, c, dec,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY dec DESC, nn_id) AS rk
        |      FROM s)
        |SELECT qid, rk, nn_id, round(c, 4) AS score,
        |       round(dec, 4) AS boosted
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_knn_cosine" -> knnOracle("cos"),
    // recommend-by-examples: 2·avg(pos) − avg(neg) built from fetched
    // vectors, examples excluded, standard FLAT anatomy
    // recommend-by-examples: 2·avg(pos) − avg(neg) built from fetched
    // vectors, examples excluded, standard FLAT anatomy
    "vdb_recommend" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |rq AS (SELECT CAST(rid AS BIGINT) AS qid, pa, pb, ng
        |       FROM (VALUES (0, 0, 1, 6), (1, 2, 3, 7), (2, 4, 5, 8))
        |         t(rid, pa, pb, ng)),
        |rv AS (SELECT rq.qid, rq.pa, rq.pb, rq.ng,
        |         list_transform(range(1, len(a.v) + 1),
        |           i -> CAST(2.0 AS DOUBLE)
        |             * ((a.v[i] + b.v[i]) / CAST(2.0 AS DOUBLE))
        |             - c.v[i]) AS qv
        |       FROM rq JOIN e a ON rq.pa = a.vec_id
        |       JOIN e b ON rq.pb = b.vec_id
        |       JOIN e c ON rq.ng = c.vec_id),
        |sc AS (SELECT rv.qid, e.vec_id AS nn_id,
        |         list_cosine_similarity(e.v, rv.qv) AS s
        |       FROM e CROSS JOIN rv
        |       WHERE e.vec_id <> rv.pa AND e.vec_id <> rv.pb
        |         AND e.vec_id <> rv.ng),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS rk
        |      FROM sc WHERE s IS NOT NULL)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // lookup_from variant: example vectors resolve in the SIBLING
    // (reversed-vector) collection; search still runs on the main one
    "vdb_recommend_lookup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |sib AS (SELECT vec_id, list_reverse(embedding::DOUBLE[]) AS v
        |        FROM embeddings),
        |rq AS (SELECT CAST(rid AS BIGINT) AS qid, pa, pb, ng
        |       FROM (VALUES (0, 0, 1, 6), (1, 2, 3, 7), (2, 4, 5, 8))
        |         t(rid, pa, pb, ng)),
        |rv AS (SELECT rq.qid, rq.pa, rq.pb, rq.ng,
        |         list_transform(range(1, len(a.v) + 1),
        |           i -> CAST(2.0 AS DOUBLE)
        |             * ((a.v[i] + b.v[i]) / CAST(2.0 AS DOUBLE))
        |             - c.v[i]) AS qv
        |       FROM rq JOIN sib a ON rq.pa = a.vec_id
        |       JOIN sib b ON rq.pb = b.vec_id
        |       JOIN sib c ON rq.ng = c.vec_id),
        |sc AS (SELECT rv.qid, e.vec_id AS nn_id,
        |         list_cosine_similarity(e.v, rv.qv) AS s
        |       FROM e CROSS JOIN rv
        |       WHERE e.vec_id <> rv.pa AND e.vec_id <> rv.pb
        |         AND e.vec_id <> rv.ng),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS rk
        |      FROM sc WHERE s IS NOT NULL)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // grouped search: per-(qid,label) top-2 hits, top-3 groups by
    // their best hit, all on rounded scores
    // grouped search: per-(qid,label) top-2 hits, top-3 groups by
    // their best hit, all on rounded scores
    "vdb_knn_groupby" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.label, e.vec_id AS nn_id,
        |        round(list_cosine_similarity(e.embedding::DOUBLE[],
        |          q.qv), 4) AS s
        |      FROM embeddings e CROSS JOIN q),
        |h AS (SELECT qid, label, nn_id, s,
        |        row_number() OVER (PARTITION BY qid, label
        |          ORDER BY s DESC, nn_id) AS hit_rk
        |      FROM d WHERE s IS NOT NULL),
        |h2 AS (SELECT * FROM h WHERE hit_rk <= 2),
        |gb AS (SELECT qid, label, s AS gs FROM h2 WHERE hit_rk = 1),
        |gr AS (SELECT qid, label,
        |         row_number() OVER (PARTITION BY qid
        |           ORDER BY gs DESC, label) AS grp_rk
        |       FROM gb)
        |SELECT h2.qid, gr.grp_rk, h2.label,
        |       CAST(h2.hit_rk AS INTEGER) AS hit_rk, h2.nn_id,
        |       h2.s AS score
        |FROM h2 JOIN gr ON h2.qid = gr.qid AND h2.label = gr.label
        |WHERE gr.grp_rk <= 3
        |ORDER BY h2.qid, gr.grp_rk, hit_rk""".stripMargin,
    // group_by + with_lookup: the groupby chain, each surviving
    // group joined to its lookup-collection payload (doc_id = label)
    "vdb_knn_groupby_lookup" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.label, e.vec_id AS nn_id,
        |        round(list_cosine_similarity(e.embedding::DOUBLE[],
        |          q.qv), 4) AS s
        |      FROM embeddings e CROSS JOIN q),
        |h AS (SELECT qid, label, nn_id, s,
        |        row_number() OVER (PARTITION BY qid, label
        |          ORDER BY s DESC, nn_id) AS hit_rk
        |      FROM d WHERE s IS NOT NULL),
        |h2 AS (SELECT * FROM h WHERE hit_rk <= 2),
        |gb AS (SELECT qid, label, s AS gs FROM h2 WHERE hit_rk = 1),
        |gr AS (SELECT qid, label,
        |         row_number() OVER (PARTITION BY qid
        |           ORDER BY gs DESC, label) AS grp_rk
        |       FROM gb)
        |SELECT h2.qid, gr.grp_rk, CAST(h2.label AS BIGINT) AS label,
        |       lk.lang AS lk_lang, lk.source AS lk_source,
        |       CAST(h2.hit_rk AS INTEGER) AS hit_rk, h2.nn_id,
        |       h2.s AS score
        |FROM h2 JOIN gr ON h2.qid = gr.qid AND h2.label = gr.label
        |LEFT JOIN documents lk ON lk.doc_id = h2.label
        |WHERE gr.grp_rk <= 3
        |ORDER BY h2.qid, gr.grp_rk, hit_rk""".stripMargin,
    // collection describe: exact counts + vector/payload shape
    "vdb_collection_info" ->
      """SELECT CAST(count(*) AS BIGINT) AS points_count,
        |       CAST(min(len(embedding)) AS BIGINT) AS dim_min,
        |       CAST(max(len(embedding)) AS BIGINT) AS dim_max,
        |       CAST(count(label) AS BIGINT) AS label_nonnull,
        |       CAST(count(DISTINCT label) AS BIGINT) AS label_distinct,
        |       CAST(min(label) AS BIGINT) AS label_min,
        |       CAST(max(label) AS BIGINT) AS label_max
        |FROM embeddings""".stripMargin,
    // scroll page 2: keyset continuation ≡ ranks 11..20 of the full
    // ordering on the 4dp-rounded score the API returned
    // scroll page 2: keyset continuation ≡ ranks 11..20 of the full
    // ordering on the 4dp-rounded score the API returned
    "vdb_scroll_page2" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |        round(list_cosine_similarity(e.embedding::DOUBLE[],
        |          q.qv), 4) AS s
        |      FROM embeddings e CROSS JOIN q),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS frk
        |      FROM d WHERE s IS NOT NULL)
        |SELECT qid, CAST(frk - 10 AS INTEGER) AS rk, nn_id,
        |       s AS score
        |FROM r WHERE frk > 10 AND frk <= 20
        |ORDER BY qid, rk""".stripMargin,
    // multi-vector OR query: best-of-two cosine, −2 sentinel on a
    // null leg so max() semantics cannot drift between engines
    // multi-vector OR query: best-of-two cosine, −2 sentinel on a
    // null leg so max() semantics cannot drift between engines
    "vdb_knn_multiquery" ->
      """WITH qa AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS q1
        |            FROM embeddings WHERE vec_id < 5),
        |qb AS (SELECT vec_id - 5 AS qid, embedding::DOUBLE[] AS q2
        |       FROM embeddings WHERE vec_id >= 5 AND vec_id < 10),
        |qq AS (SELECT qid, q1, q2 FROM qa JOIN qb USING (qid)),
        |d AS (SELECT qq.qid, e.vec_id AS nn_id,
        |        greatest(
        |          coalesce(list_cosine_similarity(e.embedding::DOUBLE[],
        |            qq.q1), -2.0),
        |          coalesce(list_cosine_similarity(e.embedding::DOUBLE[],
        |            qq.q2), -2.0)) AS s
        |      FROM embeddings e CROSS JOIN qq),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS rk
        |      FROM d WHERE s > -1.5)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_knn_filtered_eq" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q WHERE e.label = 5),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id) AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_knn_filtered_ne" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q WHERE e.label <> 5),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id) AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // /count API: heterogeneous filter batch, one pass, zero-anchored
    // (an unmatched request still answers 0)
    "vdb_count_requests" ->
      """WITH r AS (SELECT CAST(qid AS BIGINT) AS qid, fop,
        |             CAST(fval AS BIGINT) AS fval
        |           FROM (VALUES (0, '=', 5), (1, '!=', 5),
        |             (2, NULL, 0), (3, '=', 9999)) t(qid, fop, fval)),
        |c AS (SELECT r.qid, CAST(count(*) AS BIGINT) AS n
        |      FROM embeddings e JOIN r
        |        ON r.fop IS NULL
        |        OR (r.fop = '=' AND e.label = r.fval)
        |        OR (r.fop = '!=' AND e.label <> r.fval)
        |      GROUP BY 1)
        |SELECT r.qid, CAST(coalesce(c.n, 0) AS BIGINT) AS n_points
        |FROM r LEFT JOIN c ON r.qid = c.qid
        |ORDER BY r.qid""".stripMargin,
    "vdb_batch_knn" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 25 = 0),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s DESC, nn_id) AS rk
        |      FROM d WHERE s IS NOT NULL)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    "vdb_query_by_id" ->
      """SELECT vec_id, CAST(label AS BIGINT) AS label,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       round(sqrt(list_inner_product(embedding::DOUBLE[],
        |                                     embedding::DOUBLE[])), 4) AS norm
        |FROM embeddings WHERE vec_id IN (3, 17, 42) ORDER BY vec_id""".stripMargin,
    "vdb_knn_filtered_in" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q WHERE e.label IN (2, 4, 6)),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // recommend, best_score strategy: sp = best positive cosine,
    // sn = the negative's; merge = sp if sp > sn else −sn²
    "vdb_recommend_best" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |rq AS (SELECT CAST(rid AS BIGINT) AS qid, pa, pb, ng
        |       FROM (VALUES (0, 0, 1, 6), (1, 2, 3, 7), (2, 4, 5, 8))
        |         t(rid, pa, pb, ng)),
        |sc AS (SELECT rq.qid, e.vec_id AS nn_id,
        |         greatest(list_cosine_similarity(e.v, a.v),
        |                  list_cosine_similarity(e.v, b.v)) AS sp,
        |         list_cosine_similarity(e.v, c.v) AS sn
        |       FROM rq JOIN e a ON rq.pa = a.vec_id
        |            JOIN e b ON rq.pb = b.vec_id
        |            JOIN e c ON rq.ng = c.vec_id
        |            CROSS JOIN e
        |       WHERE e.vec_id <> rq.pa AND e.vec_id <> rq.pb
        |         AND e.vec_id <> rq.ng),
        |m AS (SELECT qid, nn_id,
        |        CASE WHEN sp > sn THEN sp ELSE -(sn * sn) END AS s
        |      FROM sc WHERE sp IS NOT NULL),
        |r AS (SELECT qid, nn_id, s,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY s DESC, nn_id) AS rk
        |      FROM m)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // context search: pair loss Σ min(0, cos(p)−cos(n)), no target —
    // zero-loss ties are the API shape, id tiebreak is the contract
    "vdb_context_search" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |r0 AS (SELECT * FROM (VALUES (0,3,6,4,7),(1,5,8,6,9),
        |         (2,7,10,8,11)) t(qid, p1, n1, p2, n2)),
        |d AS (SELECT r.qid, e.vec_id AS nn_id,
        |        least(0.0, list_cosine_similarity(e.v, a.v)
        |                 - list_cosine_similarity(e.v, b.v))
        |      + least(0.0, list_cosine_similarity(e.v, c.v)
        |                 - list_cosine_similarity(e.v, dd.v)) AS sc,
        |        list_cosine_similarity(e.v, a.v) AS s1
        |      FROM r0 r JOIN e a ON a.vec_id = r.p1
        |           JOIN e b ON b.vec_id = r.n1
        |           JOIN e c ON c.vec_id = r.p2
        |           JOIN e dd ON dd.vec_id = r.n2
        |           CROSS JOIN e
        |      WHERE e.vec_id NOT IN (r.p1, r.n1, r.p2, r.n2)),
        |rr AS (SELECT qid, nn_id, sc,
        |         row_number() OVER (PARTITION BY qid
        |           ORDER BY sc DESC, nn_id) AS rk
        |       FROM d WHERE s1 IS NOT NULL)
        |SELECT qid, rk, nn_id, round(sc, 4) AS score
        |FROM rr WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // named-vectors search: title = stored embedding, body = its
    // exact reversal; the request's `using` picks the target per
    // pair, one plan for the mixed batch
    "vdb_knn_named" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vt,
        |             list_reverse(embedding::DOUBLE[]) AS vb
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
        |        CASE WHEN vec_id % 2 = 0 THEN 'title' ELSE 'body' END AS u
        |      FROM embeddings WHERE vec_id < 6),
        |d AS (SELECT q.qid, e.id AS nn_id,
        |        list_cosine_similarity(
        |          CASE WHEN q.u = 'title' THEN e.vt ELSE e.vb END,
        |          q.qv) AS s
        |      FROM e CROSS JOIN q),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS rk
        |      FROM d WHERE s IS NOT NULL)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // geo-radius filtered search: lat/lon from exact integer modular
    // arithmetic; per-request planar-degree radius as the join
    // predicate (trig-free — the boundary compare replays
    // bit-identically), cosine ranking among in-radius points
    "vdb_knn_geo" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
        |             vec_id * 7919 % 18000 / 100.0 - 90.0 AS lat,
        |             vec_id * 104729 % 36000 / 100.0 - 180.0 AS lon
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
        |        vec_id * 7919 % 18000 / 100.0 - 90.0 AS qlat,
        |        vec_id * 104729 % 36000 / 100.0 - 180.0 AS qlon,
        |        25.0 + vec_id * 5.0 AS radius
        |      FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.id AS nn_id,
        |        list_cosine_similarity(e.v, q.qv) AS s
        |      FROM e JOIN q
        |        ON (e.lat - q.qlat) * (e.lat - q.qlat)
        |         + (e.lon - q.qlon) * (e.lon - q.qlon)
        |        <= q.radius * q.radius),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS rk
        |      FROM d WHERE s IS NOT NULL)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // prefetch -> rescore: top-50 by title cosine, those candidates
    // re-ranked by body (reversed) cosine, top 10
    "vdb_hybrid_prefetch" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vt,
        |             list_reverse(embedding::DOUBLE[]) AS vb
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |p AS (SELECT q.qid, e.id,
        |        list_cosine_similarity(e.vt, q.qv) AS s
        |      FROM e CROSS JOIN q),
        |pr AS (SELECT qid, id,
        |         row_number() OVER (PARTITION BY qid
        |           ORDER BY s DESC, id) AS rk
        |       FROM p WHERE s IS NOT NULL),
        |c AS (SELECT qid, id FROM pr WHERE rk <= 50),
        |r2 AS (SELECT c.qid, c.id AS nn_id,
        |         list_cosine_similarity(e.vb, q.qv) AS s
        |       FROM c JOIN e ON c.id = e.id JOIN q ON c.qid = q.qid),
        |r AS (SELECT qid, nn_id, s,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY s DESC, nn_id) AS rk
        |      FROM r2 WHERE s IS NOT NULL)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // per-request bounding box: point ± integer half-width on the
    // shared /100.0 coordinate grid — four range compares, cosine
    // ranking among the in-box survivors
    "vdb_knn_geo_bbox" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
        |             vec_id * 7919 % 18000 / 100.0 - 90.0 AS lat,
        |             vec_id * 104729 % 36000 / 100.0 - 180.0 AS lon
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
        |        vec_id * 7919 % 18000 / 100.0 - 90.0
        |          - (10.0 + vec_id * 4.0) AS lat_min,
        |        vec_id * 7919 % 18000 / 100.0 - 90.0
        |          + (10.0 + vec_id * 4.0) AS lat_max,
        |        vec_id * 104729 % 36000 / 100.0 - 180.0
        |          - (20.0 + vec_id * 8.0) AS lon_min,
        |        vec_id * 104729 % 36000 / 100.0 - 180.0
        |          + (20.0 + vec_id * 8.0) AS lon_max
        |      FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.id AS nn_id,
        |        list_cosine_similarity(e.v, q.qv) AS s
        |      FROM e JOIN q
        |        ON e.lat >= q.lat_min AND e.lat <= q.lat_max
        |       AND e.lon >= q.lon_min AND e.lon <= q.lon_max),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS rk
        |      FROM d WHERE s IS NOT NULL)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // polygon filter: even-odd ray cast unrolled over the notched
    // triangle (-120,-60) (0,60) (120,-60) (0,0) with x=lon, y=lat;
    // integer vertices keep the per-edge divide bit-identical
    "vdb_knn_geo_poly" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
        |             vec_id * 7919 % 18000 / 100.0 - 90.0 AS lat,
        |             vec_id * 104729 % 36000 / 100.0 - 180.0 AS lon
        |           FROM embeddings),
        |m AS (SELECT id, v,
        |        (CASE WHEN ((-60.0 > lat) <> (60.0 > lat)) AND
        |           lon < 120.0 * (lat - (-60.0)) / 120.0 + (-120.0)
        |           THEN 1 ELSE 0 END)
        |      + (CASE WHEN ((60.0 > lat) <> (-60.0 > lat)) AND
        |           lon < 120.0 * (lat - 60.0) / (-120.0) + 0.0
        |           THEN 1 ELSE 0 END)
        |      + (CASE WHEN ((-60.0 > lat) <> (0.0 > lat)) AND
        |           lon < (-120.0) * (lat - (-60.0)) / 60.0 + 120.0
        |           THEN 1 ELSE 0 END)
        |      + (CASE WHEN ((0.0 > lat) <> (-60.0 > lat)) AND
        |           lon < (-120.0) * (lat - 0.0) / (-60.0) + 0.0
        |           THEN 1 ELSE 0 END) AS crossings
        |      FROM e),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, m.id AS nn_id,
        |        list_cosine_similarity(m.v, q.qv) AS s
        |      FROM m CROSS JOIN q WHERE m.crossings % 2 = 1),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS rk
        |      FROM d WHERE s IS NOT NULL)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // multitenant search: tenant = label mod 4; per-request scoping
    // via the tenant-equality join, cosine ranking within the tenant
    "vdb_knn_tenant" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
        |             CAST(label AS BIGINT) % 4 AS tenant
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
        |        CAST(vec_id AS BIGINT) % 4 AS tenant
        |      FROM embeddings WHERE vec_id < 6),
        |d AS (SELECT q.qid, e.id AS nn_id,
        |        list_cosine_similarity(e.v, q.qv) AS s
        |      FROM e JOIN q ON e.tenant = q.tenant),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS rk
        |      FROM d WHERE s IS NOT NULL)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // order-by scroll: keyset page 2 over (label DESC NULLS LAST, id)
    // == global ranks pageSize+1..2*pageSize of the total order
    "vdb_scroll_orderby" ->
      """WITH r AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |             row_number() OVER (ORDER BY label DESC NULLS LAST,
        |               vec_id) AS frk
        |           FROM embeddings)
        |SELECT CAST(frk AS INTEGER) AS rk, id, label
        |FROM r WHERE frk > 10 AND frk <= 20 ORDER BY rk""".stripMargin,
    // discovery search: context-pair wins (coalesce(-2) sentinel on
    // degenerate cosines, the multiquery convention), lexicographic
    // (wins DESC, 4dp score DESC, id) ranking, example ids excluded
    "vdb_discover" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |rq AS (SELECT CAST(rid AS BIGINT) AS qid, tg, p1, n1, p2, n2
        |       FROM (VALUES (0, 0, 3, 6, 4, 7), (1, 1, 5, 8, 6, 9),
        |         (2, 2, 7, 10, 8, 11)) t(rid, tg, p1, n1, p2, n2)),
        |rv AS (SELECT rq.qid, rq.tg, rq.p1, rq.n1, rq.p2, rq.n2,
        |         t.v AS tv, a.v AS p1v, b.v AS n1v, c.v AS p2v,
        |         d2.v AS n2v
        |       FROM rq JOIN e t ON rq.tg = t.vec_id
        |            JOIN e a ON rq.p1 = a.vec_id
        |            JOIN e b ON rq.n1 = b.vec_id
        |            JOIN e c ON rq.p2 = c.vec_id
        |            JOIN e d2 ON rq.n2 = d2.vec_id),
        |sc AS (SELECT rv.qid, e.vec_id AS nn_id,
        |         (CASE WHEN coalesce(list_cosine_similarity(e.v, rv.p1v),
        |                 -2.0)
        |               > coalesce(list_cosine_similarity(e.v, rv.n1v),
        |                 -2.0)
        |               THEN 1 ELSE 0 END
        |          + CASE WHEN coalesce(list_cosine_similarity(e.v, rv.p2v),
        |                 -2.0)
        |               > coalesce(list_cosine_similarity(e.v, rv.n2v),
        |                 -2.0)
        |               THEN 1 ELSE 0 END) AS wins,
        |         list_cosine_similarity(e.v, rv.tv) AS s
        |       FROM e CROSS JOIN rv
        |       WHERE e.vec_id NOT IN (rv.tg, rv.p1, rv.n1, rv.p2, rv.n2)),
        |r AS (SELECT qid, nn_id, wins, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY wins DESC, round(s, 4) DESC, nn_id) AS rk
        |      FROM sc WHERE s IS NOT NULL)
        |SELECT qid, rk, nn_id, CAST(wins AS BIGINT) AS context_wins,
        |       round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // distance matrix: stride sample, pairwise cosine within the
    // sample, top-limit neighbors per sample point
    "vdb_distance_matrix" ->
      """WITH sp AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |            FROM embeddings WHERE vec_id % 100 = 0),
        |p AS (SELECT a.id AS id_a, b.id AS id_b,
        |        list_cosine_similarity(a.v, b.v) AS s
        |      FROM sp a CROSS JOIN sp b WHERE a.id <> b.id),
        |r AS (SELECT id_a, id_b, s,
        |        row_number() OVER (PARTITION BY id_a
        |          ORDER BY s DESC, id_b) AS rk
        |      FROM p WHERE s IS NOT NULL)
        |SELECT id_a, rk, id_b, round(s, 4) AS score
        |FROM r WHERE rk <= 3 ORDER BY id_a, rk""".stripMargin,
    // JSON-payload filtered search: the predicate reads $.k out of
    // the events `props` JSON string keyed by the vector id
    // (json_extract_string ≡ Spark's get_json_object, both return the
    // property as text; the BIGINT cast is the shared typed compare)
    "vdb_knn_filtered_json" ->
      """WITH p AS (SELECT event_id AS id,
        |             TRY_CAST(CASE WHEN json_valid(props) THEN
        |               json_extract_string(props, '$.k') END AS BIGINT)
        |               AS k
        |           FROM events),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e JOIN p ON e.vec_id = p.id CROSS JOIN q
        |      WHERE p.k < 50),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // MatchText: whole-token membership in the text payload keyed by
    // the vector id; NULL text never matches on either engine
    "vdb_knn_filtered_text" ->
      """WITH p AS (SELECT doc_id AS id, text FROM documents),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e JOIN p ON e.vec_id = p.id CROSS JOIN q
        |      WHERE list_contains(string_split(p.text, ' '), 'data')),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // array-payload membership filter: tags = [id%7, id%11, id%13]
    // (exact int64 on both engines), list_contains ≡ Spark's
    // array_contains, then the standard L2 top-10
    "vdb_knn_filtered_array" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q
        |      WHERE list_contains(
        |        [e.vec_id % 7, e.vec_id % 11, e.vec_id % 13], 3)),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // MatchExcept: the tag list must avoid every listed value
    "vdb_knn_filtered_array_except" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q
        |      WHERE NOT list_contains(
        |        [e.vec_id % 7, e.vec_id % 11, e.vec_id % 13], 3)
        |        AND NOT list_contains(
        |        [e.vec_id % 7, e.vec_id % 11, e.vec_id % 13], 5)),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_knn_filtered_range" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q
        |      WHERE e.label BETWEEN 3 AND 6),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // is_null / is_empty presence conditions: props.k masked NULL on
    // the id%3 class, tag list sliced to length id%4 — match = field
    // NULL or empty list
    "vdb_knn_filtered_isnull" ->
      """WITH p AS (SELECT event_id AS id,
        |             CASE WHEN event_id % 3 = 0 THEN NULL
        |                  WHEN json_valid(props) THEN
        |                    json_extract_string(props, '$.k') END AS pk
        |           FROM events),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e JOIN p ON e.vec_id = p.id CROSS JOIN q
        |      WHERE p.pk IS NULL OR
        |        len([e.vec_id % 7, e.vec_id % 11,
        |             e.vec_id % 13][1:CAST(e.vec_id % 4 AS INT)]) = 0),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // datetime range condition: payload ts from events by id,
    // half-open UTC window, same parquet micros on both engines
    "vdb_knn_filtered_datetime" ->
      """WITH p AS (SELECT event_id AS id, ts FROM events),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e JOIN p ON e.vec_id = p.id CROSS JOIN q
        |      WHERE p.ts >= TIMESTAMP '2024-01-01 01:00:00'
        |        AND p.ts < TIMESTAMP '2024-01-02 00:00:00'),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // values_count condition: the sliced tag list must hold >= 2
    // values
    "vdb_knn_filtered_count" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q
        |      WHERE len([e.vec_id % 7, e.vec_id % 11,
        |             e.vec_id % 13][1:CAST(e.vec_id % 4 AS INT)]) >= 2),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // match-phrase pre-filter: exact token adjacency == substring
    // containment of the space-delimited phrase in space-padded text
    // on the single-space corpus; NULL text never matches
    "vdb_knn_filtered_phrase" ->
      """WITH p AS (SELECT doc_id AS id, text FROM documents),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e JOIN p ON e.vec_id = p.id CROSS JOIN q
        |      WHERE contains(' ' || p.text || ' ', ' table value ')),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // postings-served phrase filter: the candidate-stage +
    // refinement rewrite is result-identical to the per-row contains
    // predicate by construction (the refinement IS that predicate,
    // run on candidates), so the oracle is the same statement
    "vdb_knn_filtered_phrase_idx" ->
      """WITH p AS (SELECT doc_id AS id, text FROM documents),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e JOIN p ON e.vec_id = p.id CROSS JOIN q
        |      WHERE contains(' ' || p.text || ' ', ' table value ')),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
  )
}
