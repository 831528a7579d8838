package graft

/** Multimodal-family oracle SQL — split verbatim from SparkEntry
  * (r12, r11 verdict #7). The registry stays in SparkEntry;
  * these maps are its DuckDB mirrors, byte-identical to the
  * pre-split strings.
  */
private[graft] object OracleMultimodal {
  import OracleCtes._

  val sql: Map[String, String] = Map(
    // the decode is a REAL ImageIO PNG round-trip; the oracle
    // rebuilds the expected raster (flat fill, dims and color
    // derived from doc_id + byte length — Multimodal.fixtureDims)
    // and predicts its md5, so a checksum match proves the pixels
    // actually went through the codec and came back exact
    "mm_decode" ->
      """SELECT doc_id,
        |  CAST((8 + octet_length(encode(coalesce(text, ''))) % 13)
        |     * (8 + octet_length(encode(coalesce(text, ''))) % 7) * 3 AS BIGINT)
        |    AS n_bytes,
        |  CAST(8 + octet_length(encode(coalesce(text, ''))) % 13 AS BIGINT) AS width,
        |  CAST(8 + octet_length(encode(coalesce(text, ''))) % 7 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  md5(repeat(chr(CAST(32 + doc_id % 64 AS INTEGER))
        |             || chr(CAST(32 + octet_length(encode(coalesce(text, ''))) % 64
        |                    AS INTEGER))
        |             || chr(65),
        |             (8 + octet_length(encode(coalesce(text, ''))) % 13)
        |           * (8 + octet_length(encode(coalesce(text, ''))) % 7))) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // channel stats: the oracle REBUILDS the RGB gradient from the
    // pattern formula over a generate_series grid — a sum match per
    // channel proves the pixels round-tripped the codec exactly
    // channel stats: the oracle REBUILDS the RGB gradient from the
    // pattern formula over a generate_series grid — a sum match per
    // channel proves the pixels round-tripped the codec exactly
    "mm_channel_stats" ->
      """WITH px AS (SELECT d.doc_id, ((d.doc_id % 50) * 7 + tx.x * 13
        |         + ty.y * 31) % 256 AS v
        |      FROM documents d,
        |           unnest(generate_series(0, 15)) AS tx(x),
        |           unnest(generate_series(0, 15)) AS ty(y)),
        |g AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS sum_r,
        |        CAST(sum((v + 85) % 256) AS BIGINT) AS sum_g,
        |        CAST(sum((v + 170) % 256) AS BIGINT) AS sum_b
        |      FROM px GROUP BY 1)
        |SELECT doc_id, sum_r, sum_g, sum_b,
        |       round(CAST(sum_r AS DOUBLE) / 256.0, 4) AS mean_r,
        |       round(CAST(sum_g AS DOUBLE) / 256.0, 4) AS mean_g,
        |       round(CAST(sum_b AS DOUBLE) / 256.0, 4) AS mean_b
        |FROM g ORDER BY doc_id""".stripMargin,
    // mm_features / mm_frame_sample oracles are CHAR-based mirrors of
    // the byte kernels — equivalent on the driver's ASCII fixture
    // (verified: n_chars == n_bytes throughout). A real media payload
    // is opaque bytes with no char reading at all; the byte semantics
    // are the contract, the char SQL is just DuckDB's closest mirror.
    // mm_features / mm_frame_sample oracles are CHAR-based mirrors of
    // the byte kernels — equivalent on the driver's ASCII fixture
    // (verified: n_chars == n_bytes throughout). A real media payload
    // is opaque bytes with no char reading at all; the byte semantics
    // are the contract, the char SQL is just DuckDB's closest mirror.
    "mm_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
        |  CAST(len(list_distinct(string_split(text, ''))) AS BIGINT)
        |    AS n_distinct_chars,
        |  round(list_aggregate(list_transform(string_split(text, ''),
        |          c -> ascii(c)), 'sum') * 1.0 / length(text), 4)
        |    AS mean_byte
        |FROM documents
        |WHERE octet_length(encode(text)) = length(text) AND len(text) > 0
        |ORDER BY doc_id""".stripMargin,
    // audio leg: payload as 8-bit PCM centered at 96, 64-sample
    // windows — integer-exact energy until the final sqrt/divisions
    // gaps-and-islands over silent windows: w − rank is constant
    // within a maximal run — pure integer run-length, no iteration
    // audio leg: payload as 8-bit PCM centered at 96, 64-sample
    // windows — integer-exact energy until the final sqrt/divisions
    // gaps-and-islands over silent windows: w − rank is constant
    // within a maximal run — pure integer run-length, no iteration
    "mm_audio_silence" ->
      """WITH sm AS (SELECT doc_id, i - 1 AS pos,
        |              CAST(ord(substr(text, CAST(i AS INTEGER), 1)) - 96 AS BIGINT) AS x
        |            FROM documents,
        |              unnest(range(1, len(text) + 1)) AS t(i)
        |            WHERE octet_length(encode(text)) = length(text)
        |              AND len(text) > 0),
        |wnd AS (SELECT doc_id, pos // 64 AS w,
        |          CAST(count(*) AS BIGINT) AS wn,
        |          CAST(sum(x * x) AS BIGINT) AS ss
        |        FROM sm GROUP BY 1, 2 HAVING count(*) = 64),
        |runs AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS len
        |         FROM (SELECT doc_id, w,
        |                 w - row_number() OVER (PARTITION BY doc_id
        |                   ORDER BY w) AS grp
        |               FROM wnd WHERE ss <= 6400)
        |         GROUP BY 1, 2),
        |pd AS (SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_silent,
        |         CAST(count(*) AS BIGINT) AS n_segments,
        |         CAST(max(len) AS BIGINT) AS longest_run
        |       FROM runs GROUP BY 1),
        |nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
        |       FROM wnd GROUP BY 1)
        |SELECT nw.doc_id, nw.n_windows,
        |       coalesce(pd.n_silent, 0) AS n_silent,
        |       coalesce(pd.n_segments, 0) AS n_segments,
        |       coalesce(pd.longest_run, 0) AS longest_run
        |FROM nw LEFT JOIN pd ON nw.doc_id = pd.doc_id
        |ORDER BY nw.doc_id""".stripMargin,
    // byte entropy: floor-log2 bits over the byte histogram
    // byte entropy: floor-log2 bits over the byte histogram
    "mm_byte_entropy" ->
      """WITH bf AS (SELECT doc_id, substr(text, CAST(i AS INTEGER), 1)
        |             AS ch, count(*) AS c
        |           FROM documents,
        |             unnest(range(1, len(text) + 1)) AS t(i)
        |           WHERE octet_length(encode(text)) = length(text)
        |             AND len(text) > 0
        |           GROUP BY 1, 2),
        |wn AS (SELECT doc_id, ch, c,
        |         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
        |       FROM bf),
        |wb AS (SELECT doc_id, c, n,
        |         length(bin(n // c)) - 1 AS bits
        |       FROM wn)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_bytes,
        |       CAST(count(*) AS BIGINT) AS n_distinct_bytes,
        |       round(CAST(sum(c * bits) AS DOUBLE) / max(n), 4)
        |         AS bits_per_byte
        |FROM wb GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // shot boundaries: |Δ frame-sum| > 150 cuts, runs between cuts
    // shot boundaries: |Δ frame-sum| > 150 cuts, runs between cuts
    "mm_shot_detect" ->
      """WITH sm AS (SELECT doc_id, i - 1 AS pos,
        |              CAST(ord(substr(text, CAST(i AS INTEGER), 1)) - 96 AS BIGINT) AS x
        |            FROM documents,
        |              unnest(range(1, len(text) + 1)) AS t(i)
        |            WHERE octet_length(encode(text)) = length(text)
        |              AND len(text) > 0),
        |fr AS (SELECT doc_id, pos // 64 AS f,
        |         CAST(count(*) AS BIGINT) AS fn,
        |         CAST(sum(x) AS BIGINT) AS fsum
        |       FROM sm GROUP BY 1, 2 HAVING count(*) = 64),
        |ct AS (SELECT doc_id, f,
        |         CASE WHEN abs(fsum - lag(fsum) OVER (PARTITION BY doc_id
        |             ORDER BY f)) > 150 THEN 1 ELSE 0 END AS cut
        |       FROM fr),
        |sh AS (SELECT doc_id, f,
        |         sum(cut) OVER (PARTITION BY doc_id ORDER BY f
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS shot
        |       FROM ct),
        |runs AS (SELECT doc_id, shot, CAST(count(*) AS BIGINT) AS len
        |         FROM sh GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_frames,
        |       CAST(count(*) AS BIGINT) AS n_shots,
        |       CAST(max(len) AS BIGINT) AS longest_shot,
        |       round(sum(len) * 1.0 / count(*), 4) AS mean_shot_len
        |FROM runs GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "mm_audio_energy" ->
      """WITH sm AS (SELECT doc_id, i - 1 AS pos,
        |              CAST(ord(substr(text, CAST(i AS INTEGER), 1)) - 96 AS BIGINT) AS x
        |            FROM documents,
        |              unnest(range(1, len(text) + 1)) AS t(i)
        |            WHERE octet_length(encode(text)) = length(text)
        |              AND len(text) > 0),
        |zc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        |         CAST(sum(CASE WHEN px IS NOT NULL AND x * px < 0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS crossings
        |       FROM (SELECT doc_id, x,
        |               lag(x, 1) OVER (PARTITION BY doc_id
        |                               ORDER BY pos) AS px
        |             FROM sm)
        |       GROUP BY 1),
        |wd AS (SELECT doc_id, pos // 64 AS w,
        |         CAST(count(*) AS BIGINT) AS wn,
        |         CAST(sum(x * x) AS BIGINT) AS ss
        |       FROM sm GROUP BY 1, 2 HAVING count(*) = 64),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |         max(ss) AS peak_ss, CAST(sum(ss) AS BIGINT) AS sum_ss
        |       FROM wd GROUP BY 1)
        |SELECT zc.doc_id, zc.n_samples,
        |       CAST(coalesce(pd.n_windows, 0) AS BIGINT) AS n_windows,
        |       round(sqrt(CAST(coalesce(pd.peak_ss, 0) AS DOUBLE) / 64), 4)
        |         AS peak_rms,
        |       round(CAST(coalesce(pd.sum_ss, 0) AS DOUBLE)
        |         / (coalesce(pd.n_windows, 1) * 64), 4) AS mean_energy,
        |       CASE WHEN zc.n_samples > 1 THEN
        |         round(CAST(zc.crossings AS DOUBLE)
        |           / (zc.n_samples - 1), 4) END AS zcr
        |FROM zc LEFT JOIN pd ON zc.doc_id = pd.doc_id
        |ORDER BY zc.doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH f AS (SELECT doc_id,
        |  list_transform(range(0, (length(text)-1)//16 + 1),
        |    i -> substr(text, CAST(i*16+1 AS INT), 1)) AS frames
        |  FROM documents
        |  WHERE octet_length(encode(text)) = length(text)
        |    AND len(text) > 0)
        |SELECT doc_id, CAST(len(frames) AS BIGINT) AS n_frames,
        |       md5(array_to_string(frames, '')) AS sample_md5
        |FROM f ORDER BY doc_id""".stripMargin,
    // perceptual hash over the REAL PNG encode→decode round trip: the
    // mirror predicts every bit from the pattern formula
    // v(x,y) = ((doc_id%50)·7 + 13x + 31y) mod 256 without touching a
    // codec; bit = blockSum·64 > totalSum is exact integer arithmetic
    // near-dup images: formula-predicted hashes, 16-bit pigeonhole
    // bands (complete for hamming <= 3), per-position bit compare
    // perceptual hash over the REAL PNG encode→decode round trip: the
    // mirror predicts every bit from the pattern formula
    // v(x,y) = ((doc_id%50)·7 + 13x + 31y) mod 256 without touching a
    // codec; bit = blockSum·64 > totalSum is exact integer arithmetic
    // near-dup images: formula-predicted hashes, 16-bit pigeonhole
    // bands (complete for hamming <= 3), per-position bit compare
    "dedup_phash_hamming" ->
      """WITH px AS (SELECT d.doc_id, x.x AS x, y.y AS y,
        |        ((d.doc_id % 50) * 7 + x.x * 13 + y.y * 31) % 256 AS v
        |       FROM documents d CROSS JOIN range(16) x(x)
        |            CROSS JOIN range(16) y(y)),
        |tt AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS total
        |       FROM px GROUP BY 1),
        |bb AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS idx,
        |        CAST(sum(v) AS BIGINT) AS bsum
        |       FROM px GROUP BY 1, 2),
        |bits AS (SELECT bb.doc_id, bb.idx,
        |          CASE WHEN bb.bsum * 64 > tt.total THEN 1 ELSE 0 END
        |            AS bit
        |         FROM bb JOIN tt USING (doc_id)),
        |hw AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN idx < 32 THEN
        |          bit * (CAST(1 AS BIGINT) << (31 - idx))
        |          ELSE 0 END) AS BIGINT) AS h1,
        |        CAST(sum(CASE WHEN idx >= 32 THEN
        |          bit * (CAST(1 AS BIGINT) << (63 - idx))
        |          ELSE 0 END) AS BIGINT) AS h2
        |       FROM bits GROUP BY 1),
        |bv AS (SELECT doc_id, idx // 16 AS band,
        |        CAST(sum(bit * (CAST(1 AS BIGINT) << (15 - (idx % 16))))
        |          AS BIGINT) AS bv
        |       FROM bits GROUP BY 1, 2),
        |bd AS (SELECT bv.doc_id, bv.band, bv.bv, hw.h1, hw.h2
        |       FROM bv JOIN hw USING (doc_id)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |          a.h1 AS h1a, a.h2 AS h2a, b.h1 AS h1b, b.h2 AS h2b
        |         FROM bd a JOIN bd b
        |           ON a.band = b.band AND a.bv = b.bv
        |           AND a.doc_id < b.doc_id
        |           AND (a.h1 <> b.h1 OR a.h2 <> b.h2))
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b))
        |    AS BIGINT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // nearest-neighbor resize over the real decode: dst (x,y) <-
    // src (2x, 2y); both checksums predicted from the pattern
    // formula, so a match proves decode AND resize pixel-exact
    // nearest-neighbor resize over the real decode: dst (x,y) <-
    // src (2x, 2y); both checksums predicted from the pattern
    // formula, so a match proves decode AND resize pixel-exact
    "mm_resize" ->
      """WITH g AS (SELECT x.x AS x, y.y AS y
        |           FROM range(8) x(x) CROSS JOIN range(8) y(y)),
        |px AS (SELECT d.doc_id, g.x, g.y,
        |        ((d.doc_id % 50) * 7 + (2 * g.x) * 13
        |          + (2 * g.y) * 31) % 256 AS v
        |       FROM documents d CROSS JOIN g)
        |SELECT doc_id, CAST(8 AS BIGINT) AS out_w,
        |  CAST(8 AS BIGINT) AS out_h,
        |  CAST(sum(v) AS BIGINT) AS px_sum,
        |  CAST(sum(v * (y * 8 + x + 1)) AS BIGINT) AS px_wsum
        |FROM px GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // format sniffing: even ids carry REAL PNG encodes, odd ids raw
    // utf-8 — the oracle predicts from parity alone, so a match
    // proves the sniffer read genuine magic bytes off a genuine
    // codec output
    "mm_format_sniff" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'raw' END
        |         AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_phash" ->
      """WITH px AS (SELECT d.doc_id, a.x, b.y,
        |    CAST(((d.doc_id % 50) * 7 + a.x * 13 + b.y * 31) % 256
        |      AS BIGINT) AS v
        |  FROM documents d CROSS JOIN range(16) a(x)
        |  CROSS JOIN range(16) b(y)),
        |bs AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS idx,
        |         sum(v) AS s
        |       FROM px GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(v) AS t FROM px GROUP BY 1),
        |ph AS (SELECT b.doc_id,
        |         string_agg(CASE WHEN b.s * 64 > t.t THEN '1' ELSE '0'
        |           END, '' ORDER BY b.idx) AS phash
        |       FROM bs b JOIN tot t ON b.doc_id = t.doc_id GROUP BY 1)
        |SELECT doc_id, phash,
        |       CAST(length(replace(phash, '0', '')) AS BIGINT)
        |         AS n_set_bits
        |FROM ph ORDER BY doc_id""".stripMargin,
    // image dedup on the hash: identical-content groups across
    // independent PNG encodes (docs sharing a pattern seed)
    // image dedup on the hash: identical-content groups across
    // independent PNG encodes (docs sharing a pattern seed)
    "mm_phash_dup" ->
      """WITH px AS (SELECT d.doc_id, a.x, b.y,
        |    CAST(((d.doc_id % 50) * 7 + a.x * 13 + b.y * 31) % 256
        |      AS BIGINT) AS v
        |  FROM documents d CROSS JOIN range(16) a(x)
        |  CROSS JOIN range(16) b(y)),
        |bs AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS idx,
        |         sum(v) AS s
        |       FROM px GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(v) AS t FROM px GROUP BY 1),
        |ph AS (SELECT b.doc_id,
        |         string_agg(CASE WHEN b.s * 64 > t.t THEN '1' ELSE '0'
        |           END, '' ORDER BY b.idx) AS phash
        |       FROM bs b JOIN tot t ON b.doc_id = t.doc_id GROUP BY 1)
        |SELECT phash, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(doc_id) AS canonical_id
        |FROM ph GROUP BY 1 HAVING count(*) > 1
        |ORDER BY canonical_id""".stripMargin,
  )
}
