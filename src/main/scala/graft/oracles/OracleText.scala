package graft

import graft.operators.Bpe

/** Text-family oracle SQL — split verbatim from SparkEntry
  * (r12, r11 verdict #7). The registry stays in SparkEntry;
  * these maps are its DuckDB mirrors, byte-identical to the
  * pre-split strings.
  */
private[graft] object OracleText {
  import OracleCtes._

  val sql: Map[String, String] = Map(
    // Flesch reading ease: RE2-class regex counts, double literals
    "text_readability" ->
      """WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
        |c AS (SELECT doc_id,
        |        CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
        |        CAST(len(regexp_extract_all(t, '[aeiouy]+')) AS BIGINT)
        |          AS n_syllables,
        |        CAST(greatest(len(regexp_extract_all(t, '[.!?]+')), 1)
        |          AS BIGINT) AS n_sentences
        |      FROM t)
        |SELECT doc_id, n_words, n_syllables, n_sentences,
        |       round(CAST(206.835 AS DOUBLE)
        |         - CAST(1.015 AS DOUBLE)
        |           * (CAST(n_words AS DOUBLE) / n_sentences)
        |         - CAST(84.6 AS DOUBLE)
        |           * (CAST(n_syllables AS DOUBLE) / n_words), 4)
        |         AS flesch
        |FROM c ORDER BY doc_id""".stripMargin,
    // recall@10 of the IVF path against brute force: both legs are
    // the existing deterministic mirrors, composed
    // recall-vs-nprobe curve: four probe widths over the SAME
    // trained chain, overall recall@10 against the brute scan
    // cost/recall frontier: the recall-curve blocks + probed-cell
    // size sums (the probe's scan cost) per width
    // hard-negative triplets: the near-miss pool = 16-bit simhash
    // band collisions with hamming > 1 (the dedup_simhash_pairs
    // pipeline with the bar inverted), minus the anchor's verified
    // minhash pairs; pick = same arg-min md5(anchor|cand)
    "train_triplets_hard" ->
      s"""WITH $bandCte,
         |$verifiedPairsCte,
         |ancs AS (SELECT id1 AS anchor_id, id2 AS pos_id FROM pairs
         |         UNION ALL SELECT id2, id1 FROM pairs),
         |st AS (SELECT doc_id, string_split(text, ' ') AS toks
         |       FROM documents),
         |su AS (SELECT doc_id,
         |         CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) AS h
         |       FROM (SELECT doc_id, unnest(toks) AS tok FROM st)),
         |sv AS (SELECT doc_id, bit,
         |         sum(CASE WHEN (h // (1 << bit)) % 2 = 1
         |               THEN 1 ELSE -1 END) AS vote
         |       FROM su CROSS JOIN (SELECT unnest(range(16)) AS bit)
         |       GROUP BY 1, 2),
         |ssg AS (SELECT doc_id,
         |          CAST(sum(CASE WHEN vote > 0 THEN 1 << bit ELSE 0 END)
         |            AS BIGINT) AS sh2
         |        FROM sv GROUP BY doc_id),
         |sbands AS (SELECT doc_id, sh2, 0 AS band, sh2 % 256 AS key
         |           FROM ssg
         |           UNION ALL
         |           SELECT doc_id, sh2, 1, sh2 // 256 FROM ssg),
         |scand AS (SELECT DISTINCT
         |            least(a.doc_id, b.doc_id) AS id1,
         |            greatest(a.doc_id, b.doc_id) AS id2,
         |            CASE WHEN a.doc_id < b.doc_id THEN a.sh2
         |                 ELSE b.sh2 END AS h1,
         |            CASE WHEN a.doc_id < b.doc_id THEN b.sh2
         |                 ELSE a.sh2 END AS h2
         |          FROM sbands a JOIN sbands b
         |            ON a.band = b.band AND a.key = b.key
         |              AND a.doc_id < b.doc_id),
         |miss AS (SELECT id1, id2 FROM scand
         |         WHERE bit_count(xor(h1, h2)) > 1),
         |cboth AS (SELECT id1 AS anchor_id, id2 AS cand_id FROM miss
         |          UNION ALL SELECT id2, id1 FROM miss),
         |hard AS (SELECT c.anchor_id, c.cand_id,
         |           CAST('0x' || substr(md5(CAST(c.anchor_id AS VARCHAR)
         |             || '|' || CAST(c.cand_id AS VARCHAR)), 1, 15)
         |             AS BIGINT) AS r
         |         FROM cboth c
         |         WHERE NOT EXISTS (SELECT 1 FROM ancs v
         |           WHERE v.anchor_id = c.anchor_id
         |             AND v.pos_id = c.cand_id)),
         |hsel AS (SELECT a.anchor_id, a.pos_id, h.cand_id,
         |           row_number() OVER (PARTITION BY a.anchor_id, a.pos_id
         |                              ORDER BY h.r, h.cand_id) AS rn
         |         FROM ancs a JOIN hard h ON a.anchor_id = h.anchor_id)
         |SELECT anchor_id, pos_id, cand_id AS neg_id
         |FROM hsel WHERE rn = 1 ORDER BY anchor_id, pos_id""".stripMargin,
    // funnel: stage k = first qualifying event at/after stage k-1's
    // time, per user; counts integer-exact, monotone by construction
    // multi-touch attribution: user-keyed 7-day band join, last
    // touch by (ts, event_id), linear credit summed per distinct
    // touch count (integer counts first, bounded float reduction)
    // adjacent-token PMI: exact integer counts, corpus-total bigram
    // space (the support filter prunes candidates only)
    "text_collocations" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |uni AS (SELECT u.t, CAST(count(*) AS BIGINT) AS n
        |        FROM (SELECT unnest(toks) AS t FROM t) u GROUP BY 1),
        |ut AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM uni),
        |mxl AS (SELECT CAST(coalesce(max(len(toks)), 0) AS BIGINT)
        |          AS m FROM t),
        |bg0 AS (SELECT toks[i.i + 1] AS t1, toks[i.i + 2] AS t2
        |        FROM t CROSS JOIN
        |          (SELECT unnest(range(m)) AS i FROM mxl) i
        |        WHERE i.i <= len(toks) - 2),
        |bgc AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS n_ab
        |        FROM bg0 GROUP BY 1, 2),
        |bt AS (SELECT CAST(sum(n_ab) AS BIGINT) AS bt FROM bgc),
        |sc AS (SELECT b.t1, b.t2, b.n_ab,
        |         round(log2((b.n_ab * 1.0 / bt.bt)
        |           / ((u1.n * 1.0 / ut.tt) * (u2.n * 1.0 / ut.tt))), 4)
        |           AS pmi
        |       FROM bgc b JOIN uni u1 ON b.t1 = u1.t
        |       JOIN uni u2 ON b.t2 = u2.t
        |       CROSS JOIN ut CROSS JOIN bt
        |       WHERE b.n_ab >= 5)
        |SELECT t1, t2, n_ab, pmi FROM sc
        |ORDER BY pmi DESC, t1, t2 LIMIT 20""".stripMargin,
    // event-type co-occurrence PMI over user-day incidence: pairs
    // expand only within a user-day; marginals and the total are
    // aggregate-sized
    // triplets: positives = the verified near-dup pairs (both
    // orientations); negative = arg-min md5(anchor|cand) over the
    // anchor's md5-batch mates, minus itself and its direct pairs —
    // every choice a pure function of ids, like the Spark side
    "train_triplets" ->
      s"""WITH $bandCte,
         |$verifiedPairsCte,
         |ancs AS (SELECT id1 AS anchor_id, id2 AS pos_id FROM pairs
         |         UNION ALL SELECT id2, id1 FROM pairs),
         |dbb AS (SELECT doc_id,
         |          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
         |            AS BIGINT) % 8 AS b
         |        FROM documents),
         |negc AS (SELECT a.anchor_id, a.pos_id, d2.doc_id AS cand_id,
         |           CAST('0x' || substr(md5(CAST(a.anchor_id AS VARCHAR)
         |             || '|' || CAST(d2.doc_id AS VARCHAR)), 1, 15)
         |             AS BIGINT) AS r
         |         FROM ancs a
         |         JOIN dbb d1 ON a.anchor_id = d1.doc_id
         |         JOIN dbb d2 ON d1.b = d2.b AND d2.doc_id <> a.anchor_id
         |         WHERE NOT EXISTS (SELECT 1 FROM ancs x
         |           WHERE x.anchor_id = a.anchor_id
         |             AND x.pos_id = d2.doc_id)),
         |sel AS (SELECT anchor_id, pos_id, cand_id,
         |          row_number() OVER (PARTITION BY anchor_id, pos_id
         |                             ORDER BY r, cand_id) AS rn
         |        FROM negc)
         |SELECT anchor_id, pos_id, cand_id AS neg_id
         |FROM sel WHERE rn = 1 ORDER BY anchor_id, pos_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is')))
        |    *1.0/len(toks) AS en_score,
        |  len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein')))
        |    *1.0/len(toks) AS de_score,
        |  len(list_filter(toks, t -> t IN ('le','la','les','et','est','un')))
        |    *1.0/len(toks) AS fr_score
        |  FROM t)
        |SELECT doc_id, round(en_score, 4) AS en_score,
        |       round(de_score, 4) AS de_score, round(fr_score, 4) AS fr_score,
        |       CASE WHEN en_score IS NULL THEN NULL ELSE
        |         list_sort([{'ns': -en_score, 'l': 'en'},
        |                    {'ns': -de_score, 'l': 'de'},
        |                    {'ns': -fr_score, 'l': 'fr'}])[1].l
        |       END AS predicted
        |FROM sc ORDER BY doc_id""".stripMargin,
    // language-ID confusion matrix: the langid mirror's argmax
    // grouped against the ground-truth lang column
    // language-ID confusion matrix: the langid mirror's argmax
    // grouped against the ground-truth lang column
    "langid_confusion" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is')))
        |    *1.0/len(toks) AS en_score,
        |  len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein')))
        |    *1.0/len(toks) AS de_score,
        |  len(list_filter(toks, t -> t IN ('le','la','les','et','est','un')))
        |    *1.0/len(toks) AS fr_score
        |  FROM t),
        |p AS (SELECT doc_id,
        |        list_sort([{'ns': -en_score, 'l': 'en'},
        |                   {'ns': -de_score, 'l': 'de'},
        |                   {'ns': -fr_score, 'l': 'fr'}])[1].l AS predicted
        |      FROM sc),
        |cm AS (SELECT d.lang AS actual, p.predicted,
        |         CAST(count(*) AS BIGINT) AS n
        |       FROM documents d JOIN p ON d.doc_id = p.doc_id
        |       GROUP BY 1, 2),
        |tot AS (SELECT actual, CAST(sum(n) AS BIGINT) AS n_actual
        |        FROM cm GROUP BY 1)
        |SELECT cm.actual, cm.predicted, cm.n,
        |       round(cm.n * 1.0 / tot.n_actual, 4) AS share
        |FROM cm JOIN tot ON cm.actual = tot.actual
        |ORDER BY cm.actual, cm.predicted""".stripMargin,
    // exact global deciles of the quality score; mirror assigns
    // decile by the same all-integer (rank-1)*10 div N formula over
    // the identical (score 4dp, doc_id) total order
    // budget-constrained selection: (quality DESC, doc_id) prefix
    // while the running token sum fits; the Spark side's banded
    // two-level rank+cumsum reproduces exactly this total order
    "quality_deciles" ->
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
        |        row_number() OVER (ORDER BY quality_score, doc_id) AS rnk,
        |        count(*) OVER () AS n
        |      FROM q WHERE quality_score IS NOT NULL)
        |SELECT CAST(((rnk - 1) * 10) // n AS BIGINT) + 1 AS decile,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       min(quality_score) AS min_score,
        |       max(quality_score) AS max_score,
        |       round(avg(n_tokens), 4) AS avg_tokens
        |FROM r GROUP BY 1 ORDER BY decile""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |m AS (SELECT doc_id, length(text) AS n_chars, len(toks) AS n_tokens,
        |        len(list_distinct(toks)) AS n_distinct,
        |        len(list_filter(toks,
        |          t -> t IN ('the','a','and','of','to','in','is')))
        |          *1.0/len(toks) AS sw,
        |        1.0 - len(list_distinct(toks))*1.0/len(toks) AS rep
        |      FROM t)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |       CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_distinct AS BIGINT) AS n_distinct,
        |       round((n_chars - (n_tokens - 1))*1.0/n_tokens, 4)
        |         AS avg_token_len,
        |       round(sw, 4) AS stopword_ratio,
        |       round(rep, 4) AS repetition_ratio,
        |       round((least(n_tokens/50.0, 1.0)
        |         + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
        |         + (1.0 - least(rep/0.9, 1.0))) / 3.0, 4) AS quality_score
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |    AS BIGINT) AS bpe_tokens,
        |  CASE WHEN len(regexp_extract_all(text,
        |      '[a-z]+|[0-9]+|[^a-z0-9 ]')) > 0 THEN
        |    round(length(text)*1.0
        |      / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')), 4)
        |  END AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    // quantile_cont ≡ Spark's exact `percentile` (both linear
    // interpolation at index p·(n−1))
    // chunk_id ≡ start_tok / stride (posexplode numbers the sequence
    // 0, stride, 2·stride… in order), so the oracle derives it
    // arithmetically; DuckDB list slicing clamps at the list end the
    // same way Spark's slice(length=32) does for the short final
    // window
    "text_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |                  len(string_split(text, ' ')) AS n
        |           FROM documents WHERE text IS NOT NULL),
        |x AS (SELECT doc_id, toks, n,
        |             unnest(range(0, greatest(n, 1), 24)) AS st
        |      FROM t)
        |SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_id,
        |       CAST(st AS BIGINT) AS start_tok,
        |       CAST(least(32, n - st) AS BIGINT) AS n_chunk_toks,
        |       md5(array_to_string(toks[st + 1 : least(st + 32, n)], ' '))
        |         AS chunk_md5
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin,
    // offset packing over the chunk table: a chunk joins the sequence
    // holding its cumulative start offset (integer window cumsum +
    // floor-div — replays exactly)
    // offset packing over the chunk table: a chunk joins the sequence
    // holding its cumulative start offset (integer window cumsum +
    // floor-div — replays exactly)
    "chunk_pack" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |                  len(string_split(text, ' ')) AS n
        |           FROM documents WHERE text IS NOT NULL),
        |x AS (SELECT doc_id, n, unnest(range(0, greatest(n, 1), 24)) AS st
        |      FROM t),
        |c AS (SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_id,
        |             CAST(st AS BIGINT) AS start_tok,
        |             CAST(least(32, n - st) AS BIGINT) AS n_chunk_toks
        |      FROM x),
        |s AS (SELECT doc_id, chunk_id, start_tok, n_chunk_toks,
        |             coalesce(sum(n_chunk_toks) OVER (
        |               PARTITION BY doc_id ORDER BY chunk_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) AS cum
        |      FROM c)
        |SELECT doc_id, CAST(cum // 128 AS BIGINT) AS seq_id,
        |       CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(sum(n_chunk_toks) AS BIGINT) AS seq_toks,
        |       min(start_tok) AS first_tok
        |FROM s GROUP BY doc_id, seq_id
        |ORDER BY doc_id, seq_id""".stripMargin,
    // length-bucketed batching: cap = 2^ceil(log2 n) via INTEGER
    // bin-length (length(bin(n-1)) — the shared floor-log2
    // discipline), clamped to [16, 512]; batches of 8; the only
    // double is the final waste ratio
    // length-bucketed batching: cap = 2^ceil(log2 n) via INTEGER
    // bin-length (length(bin(n-1)) — the shared floor-log2
    // discipline), clamped to [16, 512]; batches of 8; the only
    // double is the final waste ratio
    "train_length_buckets" ->
      """WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |c AS (SELECT n,
        |        least(512, greatest(16,
        |          1::BIGINT << length(bin(greatest(n, 2) - 1)))) AS cap
        |      FROM t),
        |g AS (SELECT cap AS bucket_cap, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(n) AS BIGINT) AS total_tokens
        |      FROM c GROUP BY 1)
        |SELECT bucket_cap, n_docs, total_tokens,
        |       (n_docs + 7) // 8 AS n_batches,
        |       ((n_docs + 7) // 8) * 8 * bucket_cap AS padded_slots,
        |       round((((n_docs + 7) // 8) * 8 * bucket_cap - total_tokens)
        |         * 1.0 / (((n_docs + 7) // 8) * 8 * bucket_cap), 4)
        |         AS waste_pct
        |FROM g ORDER BY bucket_cap""".stripMargin,
    // planted-PII corpus (corpusWithPii): counts via
    // regexp_extract_all length, redaction email→phone→ip with the
    // 'g' flag (Spark's regexp_replace is global by default)
    // planted-PII corpus (corpusWithPii): counts via
    // regexp_extract_all length, redaction email→phone→ip with the
    // 'g' flag (Spark's regexp_replace is global by default)
    "text_pii_redact" ->
      """WITH p AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 10 = 0
        |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0
        |         THEN ' call 555-123-4567 or 555-987-6543' ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0
        |         THEN ' from host 192.168.1.10' ELSE '' END AS text
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(text,
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT)
        |    AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g'))
        |    AS redacted_md5
        |FROM p)
        |SELECT doc_id, n_emails, n_phones, n_ips, redacted_md5,
        |       n_emails + n_phones + n_ips AS n_pii
        |FROM m ORDER BY doc_id""".stripMargin,
    // n-grams via list_transform ranges (1-based: range(1, len) gives
    // the len-1 bigram starts); fractions NULL when a doc has no
    // bigrams/trigrams, matching the Spark left joins
    // n-grams via list_transform ranges (1-based: range(1, len) gives
    // the len-1 bigram starts); fractions NULL when a doc has no
    // bigrams/trigrams, matching the Spark left joins
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |uc AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
        |ua AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
        |              max(c) AS mu FROM uc GROUP BY 1),
        |b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t),
        |bc AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
        |ba AS (SELECT doc_id, sum(c) AS n_bi, max(c) AS mb
        |       FROM bc GROUP BY 1),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS tg
        |      FROM t),
        |gc AS (SELECT doc_id, tg, count(*) AS c FROM g GROUP BY 1, 2),
        |ga AS (SELECT doc_id, sum(c) AS n_tri,
        |              sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
        |       FROM gc GROUP BY 1)
        |SELECT ua.doc_id, ua.n_toks,
        |       round(CAST(mu AS DOUBLE) / n_toks, 4) AS top_unigram_frac,
        |       round(CAST(mb AS DOUBLE) / n_bi, 4) AS top_bigram_frac,
        |       round(CAST(dup AS DOUBLE) / n_tri, 4) AS dup_trigram_frac
        |FROM ua LEFT JOIN ba USING (doc_id) LEFT JOIN ga USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH n AS (SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
        |  FROM documents)
        |SELECT doc_id, fp_md5,
        |       CAST('0x' || substr(fp_md5, 1, 15) AS BIGINT) AS fp60
        |FROM n ORDER BY doc_id""".stripMargin,
    // Unicode normalization report: NFC + width-fold + casefold. The
    // translate tables interpolate from the SAME Scala vals the Spark
    // side uses (escaped for a single-quoted literal), so the two
    // engines cannot drift by a character; nfc_normalize is DuckDB's
    // canonical-composition twin of the codegen'd NfcNormalize.
    // Unicode normalization report: NFC + width-fold + casefold. The
    // translate tables interpolate from the SAME Scala vals the Spark
    // side uses (escaped for a single-quoted literal), so the two
    // engines cannot drift by a character; nfc_normalize is DuckDB's
    // canonical-composition twin of the codegen'd NfcNormalize.
    "text_normalize" -> {
      def sqlLit(v: String) = "'" + v.replace("'", "''") + "'"
      val from = sqlLit(graft.operators.TextOps.widthFoldFrom)
      val to = sqlLit(graft.operators.TextOps.widthFoldTo)
      s"""WITH nt AS (SELECT doc_id, text,
         |        lower(translate(nfc_normalize(text), $from, $to)) AS nx
         |      FROM documents)
         |SELECT doc_id, CAST(length(text) AS BIGINT) AS len_raw,
         |       CAST(length(nx) AS BIGINT) AS len_norm,
         |       text <> nx AS changed, md5(nx) AS norm_md5
         |FROM nt ORDER BY doc_id""".stripMargin
    },
    // type-token ratio: exact integer counts, one 4dp division
    // type-token ratio: exact integer counts, one 4dp division
    "text_ttr" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
        |           FROM documents),
        |c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |        CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
        |      FROM w)
        |SELECT doc_id, n_words, n_distinct,
        |       round(CAST(n_distinct AS DOUBLE) / n_words, 4) AS ttr
        |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    // hapax legomena per source: exact integer counts off one
    // (source, token) aggregate; ratios are single exact-long divisions
    // hapax legomena per source: exact integer counts off one
    // (source, token) aggregate; ratios are single exact-long divisions
    "text_hapax" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |g AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS tf
        |      FROM t GROUP BY 1, 2)
        |SELECT source, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS vocab,
        |       CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS hapax,
        |       round(CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
        |         AS DOUBLE) / count(*), 6) AS hapax_ratio,
        |       round(CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
        |         AS DOUBLE) / sum(tf), 6) AS hapax_token_share
        |FROM g GROUP BY 1 ORDER BY source""".stripMargin,
    // n-gram coverage of eval by train (doc_id%10 8/2 split): per n,
    // distinct + occurrence-weighted coverage via one gram-keyed
    // left join per n against the train distinct set
    // RAKE: phrase id = running stopword count; word score =
    // truncating (deg·10⁴)//freq fixed-point so phrase scores and
    // the top-k rank are all-integer; phrase string reassembled in
    // position order on both engines
    "text_rake_keywords" ->
      """WITH wlist AS (SELECT doc_id, string_split(text, ' ') AS ws
        |               FROM documents),
        |tk AS (SELECT doc_id, i AS pos, ws[i] AS tok
        |       FROM wlist, unnest(range(1, len(ws) + 1)) AS t(i)),
        |fl AS (SELECT doc_id, pos, tok,
        |         CASE WHEN tok IN ('the','a','and','of','to','in','is')
        |              THEN 1 ELSE 0 END AS is_stop
        |       FROM tk),
        |g AS (SELECT doc_id, pos, tok, is_stop,
        |        sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS UNBOUNDED PRECEDING) AS pid
        |      FROM fl),
        |words AS (SELECT doc_id, pid, pos, tok FROM g
        |          WHERE is_stop = 0 AND tok <> ''),
        |ph AS (SELECT doc_id, pid,
        |         string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |         CAST(count(*) AS BIGINT) AS plen
        |       FROM words GROUP BY 1, 2),
        |occ AS (SELECT w.doc_id, w.pid, w.tok, ph.phrase, ph.plen
        |        FROM words w JOIN ph ON w.doc_id = ph.doc_id
        |                            AND w.pid = ph.pid),
        |ws2 AS (SELECT tok, (CAST(sum(plen) AS BIGINT) * 10000)
        |          // CAST(count(*) AS BIGINT) AS wscore
        |        FROM occ GROUP BY 1),
        |ps AS (SELECT occ.doc_id, occ.pid, occ.phrase, occ.plen,
        |         CAST(sum(ws2.wscore) AS BIGINT) AS score_scaled
        |       FROM occ JOIN ws2 USING (tok) GROUP BY 1, 2, 3, 4),
        |dd AS (SELECT phrase, CAST(max(plen) AS BIGINT) AS n_words,
        |         CAST(count(*) AS BIGINT) AS n_occur,
        |         CAST(max(score_scaled) AS BIGINT) AS score_scaled
        |       FROM ps GROUP BY 1),
        |r AS (SELECT phrase, n_words, n_occur, score_scaled,
        |        CAST(row_number() OVER (ORDER BY score_scaled DESC,
        |          phrase) AS BIGINT) AS rk
        |      FROM dd)
        |SELECT rk, phrase, n_words, n_occur,
        |       round(CAST(score_scaled AS DOUBLE) / 10000.0, 4) AS score
        |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin,
    // within-doc token entropy: integer floor-log2 bits (length of
    // the binary rendering of n div tf), BIGINT Σ tf·bits fold, one
    // final exact-long division — the text_surprisal discipline
    // within-doc token entropy: integer floor-log2 bits (length of
    // the binary rendering of n div tf), BIGINT Σ tf·bits fold, one
    // final exact-long division — the text_surprisal discipline
    "text_token_entropy" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |g AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |      FROM t GROUP BY 1, 2),
        |n AS (SELECT doc_id, tok, tf,
        |        sum(tf) OVER (PARTITION BY doc_id) AS n
        |      FROM g),
        |b AS (SELECT doc_id, tf, n,
        |        CAST(length(bin(n // tf)) AS BIGINT) - 1 AS bits
        |      FROM n)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS n_distinct,
        |       CAST(sum(tf * bits) AS BIGINT) AS total_bits,
        |       round(CAST(sum(tf * bits) AS DOUBLE) / max(n), 4)
        |         AS bits_per_token
        |FROM b GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // Simpson diversity of language mix per source: the HHI integer
    // arithmetic (squares via HUGEINT) pointed at corpus composition
    // second capstone: cleaned corpus → md5 split → per-split volumes
    // + residual cross-split contamination (the decontam formulation
    // over the CLEANED corpus); CTE names suffixed A to avoid the
    // shared victims chain's names
    "pipeline_train_eval" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte,
         |victims AS (SELECT id AS doc_id FROM reach
         |            GROUP BY id HAVING id <> min(r)),
         |tt AS (SELECT doc_id, text, string_split(text, ' ') AS toks
         |       FROM documents),
         |m AS (SELECT doc_id, len(toks) AS n_tokens,
         |        len(list_filter(toks,
         |          t -> t IN ('the','a','and','of','to','in','is')))
         |          *1.0/len(toks) AS sw,
         |        1.0 - len(list_distinct(toks))*1.0/len(toks) AS rep
         |      FROM tt),
         |qs AS (SELECT doc_id, round((least(n_tokens/50.0, 1.0)
         |         + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
         |         + (1.0 - least(rep/0.9, 1.0))) / 3.0, 4) AS quality_score
         |       FROM m),
         |clA AS (SELECT d.doc_id, d.text FROM documents d
         |        JOIN qs q ON d.doc_id = q.doc_id
         |        WHERE q.quality_score >= 0.5
         |          AND NOT EXISTS (SELECT 1 FROM victims v
         |                          WHERE v.doc_id = d.doc_id)),
         |splA AS (SELECT doc_id, text,
         |           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
         |                     < 'cccd' THEN 'train'
         |                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
         |                     < 'e666' THEN 'val'
         |                ELSE 'test' END AS split
         |         FROM clA),
         |${shingleCteFrom("splA", "A")},
         |sxA AS (SELECT doc_id, unnest(shingles) AS s FROM shA),
         |tsA AS (SELECT sxA.doc_id AS train_id, s
         |        FROM sxA JOIN splA USING (doc_id) WHERE split = 'train'),
         |esA AS (SELECT sxA.doc_id AS eval_id, s
         |        FROM sxA JOIN splA USING (doc_id) WHERE split <> 'train'),
         |ecA AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS c
         |        FROM esA GROUP BY 1),
         |inA AS (SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS n
         |        FROM tsA JOIN esA USING (s) GROUP BY 1, 2),
         |coA AS (SELECT DISTINCT eval_id AS doc_id
         |        FROM inA JOIN ecA USING (eval_id) WHERE n / c >= 0.2),
         |cbA AS (SELECT splA.split, CAST(count(*) AS BIGINT)
         |          AS n_contaminated
         |        FROM coA JOIN splA USING (doc_id) GROUP BY 1),
         |rpA AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         |                 AS n_tokens
         |        FROM splA GROUP BY 1)
         |SELECT r.split, r.n_docs, r.n_tokens,
         |       coalesce(cbA.n_contaminated, 0) AS n_contaminated
         |FROM rpA r LEFT JOIN cbA ON r.split = cbA.split
         |ORDER BY r.split""".stripMargin,
    "pipeline_clean_corpus" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte,
         |victims AS (SELECT id AS doc_id FROM reach
         |            GROUP BY id HAVING id <> min(r)),
         |tt AS (SELECT doc_id, text, string_split(text, ' ') AS toks
         |       FROM documents),
         |m AS (SELECT doc_id, len(toks) AS n_tokens,
         |        len(list_filter(toks,
         |          t -> t IN ('the','a','and','of','to','in','is')))
         |          *1.0/len(toks) AS sw,
         |        1.0 - len(list_distinct(toks))*1.0/len(toks) AS rep
         |      FROM tt),
         |qs AS (SELECT doc_id, round((least(n_tokens/50.0, 1.0)
         |         + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
         |         + (1.0 - least(rep/0.9, 1.0))) / 3.0, 4) AS quality_score
         |       FROM m)
         |SELECT d.source AS source, CAST(count(*) AS BIGINT) AS n_docs,
         |       round(avg(q.quality_score), 4) AS avg_quality
         |FROM documents d JOIN qs q ON d.doc_id = q.doc_id
         |WHERE q.quality_score >= 0.5
         |  AND NOT EXISTS (SELECT 1 FROM victims v WHERE v.doc_id = d.doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // request-batch dispatch: metric and filter are per-request DATA
    // (the reference's /search payload); ordering key is the
    // request's own metric, filter evaluated as a predicate
    // boilerplate: trigram doc-frequency tail at a 1%-of-corpus bar,
    // per-doc occurrence rollup (left join keeps sub-trigram docs)
    "text_boilerplate" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |g AS (SELECT doc_id, concat_ws(' ', list_slice(ws, i, i + 2)) AS gram
        |      FROM d, unnest(range(1, len(ws) - 1)) AS t(i)
        |      WHERE len(ws) >= 3),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
        |bo AS (SELECT gram FROM g GROUP BY gram
        |       HAVING count(DISTINCT doc_id) >=
        |         (SELECT ceil(nd * 0.01) FROM nd)),
        |per AS (SELECT doc_id, count(*) AS n_grams,
        |          count(*) FILTER (WHERE gram IN (SELECT gram FROM bo))
        |            AS n_boiler
        |        FROM g GROUP BY doc_id)
        |SELECT d2.doc_id,
        |       CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
        |       CAST(coalesce(per.n_boiler, 0) AS BIGINT) AS n_boiler,
        |       coalesce(round(per.n_boiler * 1.0 / per.n_grams, 4), 0.0)
        |         AS boiler_ratio
        |FROM documents d2 LEFT JOIN per ON d2.doc_id = per.doc_id
        |ORDER BY d2.doc_id""".stripMargin,
    // Q2 shape: per-part min 2dp mean unit price among EUROPE
    // suppliers, argmin join-back returns every achieving supplier
    "text_tfidf_keywords" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2),
        |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, tok,
        |         round(tf * ln(n_docs * 1.0 / df), 4) AS score
        |       FROM tf JOIN df USING (tok) CROSS JOIN nn),
        |r AS (SELECT doc_id, tok, score,
        |        row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY score DESC, tok) AS rk
        |      FROM sc)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, score
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    // unigram surprisal: integer floor-log2 via length(bin(t // ctf))
    // − 1 on both engines; only the final bits/token divide is float
    // unigram surprisal: integer floor-log2 via length(bin(t // ctf))
    // − 1 on both engines; only the final bits/token divide is float
    "text_surprisal" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2),
        |cnt AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS ctf
        |        FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS t FROM cnt),
        |sc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |         CAST(sum(tf * (length(bin(t // ctf)) - 1)) AS BIGINT)
        |           AS total_bits
        |       FROM tf JOIN cnt USING (tok) CROSS JOIN tot GROUP BY 1)
        |SELECT doc_id, n_tokens, total_bits,
        |       round(total_bits * 1.0 / n_tokens, 4) AS bits_per_token
        |FROM sc ORDER BY doc_id""".stripMargin,
    // bigram surprisal: the same integer floor-log2 path conditioned
    // on the previous token; DuckDB builds bigrams off the 1-based
    // token list (range end-exclusive, so i+1 stays in bounds)
    // bigram surprisal: the same integer floor-log2 path conditioned
    // on the previous token; DuckDB builds bigrams off the 1-based
    // token list (range end-exclusive, so i+1 stays in bounds)
    "text_bigram_surprisal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |bg AS (SELECT doc_id, ws[i] AS a, ws[i + 1] AS b
        |       FROM w, unnest(range(1, len(ws))) AS t(i)),
        |tf AS (SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS tf
        |       FROM bg GROUP BY 1, 2, 3),
        |cab AS (SELECT a, b, CAST(sum(tf) AS BIGINT) AS cab
        |        FROM tf GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca
        |       FROM cab GROUP BY 1),
        |sc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |         CAST(sum(tf * (length(bin(ca // cab)) - 1)) AS BIGINT)
        |           AS total_bits
        |       FROM tf JOIN cab USING (a, b) JOIN ca USING (a)
        |       GROUP BY 1)
        |SELECT doc_id, n_bigrams, total_bits,
        |       round(total_bits * 1.0 / n_bigrams, 4) AS bits_per_bigram
        |FROM sc ORDER BY doc_id""".stripMargin,
    // Cavnar-Trenkle rank-order language ID: train-split char-trigram
    // profiles (top-20, (count DESC, gram) tiebreak), out-of-place
    // distance with max penalty 20, argmin with lang tiebreak
    // Cavnar-Trenkle rank-order language ID: train-split char-trigram
    // profiles (top-20, (count DESC, gram) tiebreak), out-of-place
    // distance with max penalty 20, argmin with lang tiebreak
    "langid_ngram" ->
      """WITH pd AS (SELECT doc_id, lang, text || repeat(CASE lang
        |        WHEN 'en' THEN ' the of and to in is that it was for'
        |        WHEN 'de' THEN ' der die das und ist ein nicht mit sich auf'
        |        WHEN 'fr' THEN ' le la les et est un une pas que dans'
        |        WHEN 'es' THEN ' el la los y es un una no que por'
        |        WHEN 'zh' THEN ' de shi bu le zai you wo ta men zhe'
        |        ELSE '' END, 3) AS text
        |      FROM documents),
        |g AS (SELECT d.doc_id, d.lang, substr(d.text, i.i, 3) AS g
        |      FROM pd d,
        |           unnest(range(1, greatest(length(d.text) - 1, 1)))
        |             AS i(i)),
        |lp AS (SELECT lang AS plang, g, lr FROM (
        |    SELECT lang, g, row_number() OVER (PARTITION BY lang
        |        ORDER BY n DESC, g) AS lr
        |    FROM (SELECT lang, g, CAST(count(*) AS BIGINT) AS n
        |          FROM g WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |            < 'cccd' AND lang IS NOT NULL
        |          GROUP BY 1, 2)) WHERE lr <= 20),
        |dp AS (SELECT doc_id, g, dr FROM (
        |    SELECT doc_id, g, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY n DESC, g) AS dr
        |    FROM (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS n
        |          FROM g GROUP BY 1, 2)) WHERE dr <= 20),
        |ls AS (SELECT DISTINCT plang FROM lp),
        |pen AS (SELECT dp.doc_id, ls.plang,
        |         CAST(CASE WHEN lp.lr IS NOT NULL
        |           THEN abs(dp.dr - lp.lr) ELSE 20 END AS BIGINT) AS pen
        |        FROM dp CROSS JOIN ls
        |        LEFT JOIN lp ON lp.plang = ls.plang AND lp.g = dp.g),
        |ds AS (SELECT doc_id, plang, CAST(sum(pen) AS BIGINT) AS dist
        |       FROM pen GROUP BY 1, 2),
        |bst AS (SELECT doc_id, plang AS predicted, dist AS distance
        |        FROM (SELECT doc_id, plang, dist, row_number() OVER (
        |            PARTITION BY doc_id ORDER BY dist, plang) AS rn
        |          FROM ds) WHERE rn = 1)
        |SELECT d.doc_id, d.lang AS actual, b.predicted, b.distance
        |FROM pd d LEFT JOIN bst b ON d.doc_id = b.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // CCNet head/middle/tail: every doc scored under the train-split
    // backoff model, exact p33/p66 cuts per language, volumes + share
    // held-out cross-entropy with stupid backoff: train-split bigram
    // model, integer floor-log2 bits (seen / backoff / 40-bit OOV
    // sentinel), exact BIGINT sums, one final division
    "text_xent_score" ->
      """WITH pd AS (SELECT doc_id,
        |        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |               >= 'cccd' AND doc_id % 3 = 0
        |             THEN text || ' zzqx7 table' ELSE text END AS text
        |      FROM documents),
        |w AS (SELECT doc_id,
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
        |          AS is_train,
        |        string_split(text, ' ') AS ws
        |      FROM pd),
        |bg AS (SELECT doc_id, is_train, ws[i] AS a, ws[i + 1] AS b
        |       FROM w, unnest(range(1, len(ws))) AS t(i)),
        |cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cab
        |        FROM bg WHERE is_train GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca
        |       FROM cab GROUP BY 1),
        |cb AS (SELECT b, CAST(sum(cab) AS BIGINT) AS cb
        |       FROM cab GROUP BY 1),
        |nt AS (SELECT CAST(sum(cab) AS BIGINT) AS nn FROM cab),
        |vb AS (SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS tf
        |       FROM bg WHERE NOT is_train GROUP BY 1, 2, 3),
        |sc AS (SELECT vb.doc_id, vb.tf,
        |         CASE WHEN cab.cab IS NOT NULL
        |              THEN CAST(length(bin(ca.ca // cab.cab)) - 1
        |                     AS BIGINT)
        |              WHEN cb.cb IS NOT NULL
        |              THEN CAST(length(bin((5 * nt.nn) // (2 * cb.cb)))
        |                     - 1 AS BIGINT)
        |              ELSE 40 END AS bits,
        |         CASE WHEN cab.cab IS NOT NULL THEN 0
        |              WHEN cb.cb IS NOT NULL THEN 1 ELSE 2 END AS kind
        |       FROM vb
        |       LEFT JOIN cab ON vb.a = cab.a AND vb.b = cab.b
        |       LEFT JOIN ca ON vb.a = ca.a
        |       LEFT JOIN cb ON vb.b = cb.b
        |       CROSS JOIN nt)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |  CAST(sum(tf * bits) AS BIGINT) AS total_bits,
        |  CAST(sum(CASE WHEN kind = 1 THEN tf ELSE 0 END) AS BIGINT)
        |    AS n_backoff,
        |  CAST(sum(CASE WHEN kind = 2 THEN tf ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  round(sum(tf * bits) * 1.0 / sum(tf), 4) AS bits_per_bigram
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // BPE training/tokenization mirrors are program-generated unrolled
    // CTE chains (one per merge round) — see Bpe.oracleCtes
    // BPE training/tokenization mirrors are program-generated unrolled
    // CTE chains (one per merge round) — see Bpe.oracleCtes
    "bpe_learn" -> Bpe.learnOracle(8),
    "bpe_learn_batched" -> Bpe.batchedOracle(4, 4),
    "bpe_tokenize" -> Bpe.tokenizeOracle(8),
    // model-based quality gate: fixed-point features via `//` (the
    // IntegralDivide mirror), integer score, integer threshold
    // model-based quality gate: fixed-point features via `//` (the
    // IntegralDivide mirror), integer score, integer threshold
    "quality_classifier" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2),
        |f AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
        |        CAST(count(*) AS BIGINT) AS n_distinct,
        |        CAST(max(tf) AS BIGINT) AS max_tf,
        |        CAST(sum(CASE WHEN tok IN
        |            ('the','a','and','of','to','in','is')
        |          THEN tf ELSE 0 END) AS BIGINT) AS stop_hits
        |      FROM tf GROUP BY 1),
        |x AS (SELECT doc_id, n_toks,
        |        CAST(least((n_toks * 10000) // 100, 10000) AS BIGINT)
        |          AS len_fp,
        |        CAST((n_distinct * 10000) // n_toks AS BIGINT) AS ttr_fp,
        |        CAST((stop_hits * 10000) // n_toks AS BIGINT) AS stop_fp,
        |        CAST((max_tf * 10000) // n_toks AS BIGINT) AS toptok_fp
        |      FROM f)
        |SELECT doc_id, n_toks, len_fp, ttr_fp, stop_fp, toptok_fp,
        |       CAST(3 * len_fp + 3 * ttr_fp + 2 * stop_fp - 4 * toptok_fp
        |         AS BIGINT) AS score,
        |       (3 * len_fp + 3 * ttr_fp + 2 * stop_fp - 4 * toptok_fp)
        |         >= 28000 AS keep
        |FROM x ORDER BY doc_id""".stripMargin,
    // BERT MLM 15% / 80-10-10: namespaced md5 coin per (doc,pos)
    // BERT MLM 15% / 80-10-10: namespaced md5 coin per (doc,pos)
    "train_mlm_mask" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |tk AS (SELECT doc_id, i - 1 AS pos
        |       FROM t, unnest(range(1, len(ws) + 1)) AS u(i)),
        |hs AS (SELECT doc_id,
        |         CAST('0x' || substr(md5('m|' || CAST(doc_id AS VARCHAR)
        |           || '|' || CAST(pos AS VARCHAR)), 1, 15) AS BIGINT)
        |           AS h
        |       FROM tk),
        |fl AS (SELECT doc_id, h % 100 < 15 AS m, (h // 100) % 10 AS r
        |       FROM hs)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_masked,
        |       CAST(sum(CASE WHEN m AND r < 8 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_mask_tok,
        |       CAST(sum(CASE WHEN m AND r = 8 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_random,
        |       CAST(sum(CASE WHEN m AND r = 9 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_keep,
        |       round(CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*), 4) AS mask_ratio
        |FROM fl GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // T5 span corruption: md5 coin per (doc,pos), 1/20 starts,
    // len 1..4, overlaps merged to runs = sentinels
    // T5 span corruption: md5 coin per (doc,pos), 1/20 starts,
    // len 1..4, overlaps merged to runs = sentinels
    "train_span_corrupt" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |tk AS (SELECT doc_id, i - 1 AS pos
        |       FROM t, unnest(range(1, len(ws) + 1)) AS u(i)),
        |nt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
        |       FROM tk GROUP BY 1),
        |hs AS (SELECT doc_id, pos,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
        |           || CAST(pos AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |       FROM tk),
        |st AS (SELECT doc_id, pos, 1 + (h // 20) % 4 AS len
        |       FROM hs WHERE h % 20 = 0),
        |cov0 AS (SELECT DISTINCT st.doc_id, u.cp
        |         FROM st, unnest(range(st.pos, st.pos + st.len))
        |           AS u(cp)),
        |cov AS (SELECT c.doc_id, c.cp FROM cov0 c
        |        JOIN nt ON c.doc_id = nt.doc_id
        |        WHERE c.cp < nt.n_tokens),
        |rn AS (SELECT doc_id, cp,
        |         lag(cp) OVER (PARTITION BY doc_id ORDER BY cp) AS pc
        |       FROM cov),
        |runs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_masked,
        |           CAST(sum(CASE WHEN pc IS NULL OR cp - pc > 1
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
        |         FROM rn GROUP BY 1)
        |SELECT nt.doc_id, nt.n_tokens,
        |       CAST(coalesce(runs.n_spans, 0) AS BIGINT) AS n_spans,
        |       CAST(coalesce(runs.n_masked, 0) AS BIGINT) AS n_masked,
        |       round(CAST(coalesce(runs.n_masked, 0) AS DOUBLE)
        |         / nt.n_tokens, 4) AS corrupt_ratio,
        |       CAST(nt.n_tokens - coalesce(runs.n_masked, 0)
        |         + coalesce(runs.n_spans, 0) AS BIGINT) AS input_len,
        |       CAST(coalesce(runs.n_masked, 0)
        |         + coalesce(runs.n_spans, 0) AS BIGINT) AS target_len
        |FROM nt LEFT JOIN runs ON nt.doc_id = runs.doc_id
        |ORDER BY nt.doc_id""".stripMargin,
    // dataset card: 1-row composition of proven aggregates (size,
    // exact-dup share, near-dup pairs, both gates' keep rates)
    // Cohen's kappa between the model gate and the heuristic gate,
    // both gates off the one tf aggregate; pe=1 degenerates to NULL
    "quality_kappa" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2),
        |f AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
        |        CAST(count(*) AS BIGINT) AS n_distinct,
        |        CAST(max(tf) AS BIGINT) AS max_tf,
        |        CAST(sum(CASE WHEN tok IN
        |            ('the','a','and','of','to','in','is')
        |          THEN tf ELSE 0 END) AS BIGINT) AS stop_hits
        |      FROM tf GROUP BY 1),
        |g AS (SELECT
        |        (3 * least((n_toks * 10000) // 100, 10000)
        |          + 3 * ((n_distinct * 10000) // n_toks)
        |          + 2 * ((stop_hits * 10000) // n_toks)
        |          - 4 * ((max_tf * 10000) // n_toks)) >= 28000 AS keep_m,
        |        round((least(n_toks/50.0, 1.0)
        |          + CASE WHEN stop_hits*1.0/n_toks BETWEEN 0.01 AND 0.6
        |              THEN 1.0 ELSE 0.0 END
        |          + (1.0 - least((1.0 - n_distinct*1.0/n_toks)/0.9,
        |              1.0))) / 3.0, 4) >= 0.5 AS keep_h
        |      FROM f),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN keep_m THEN 1 ELSE 0 END) AS BIGINT)
        |          AS keep_model,
        |        CAST(sum(CASE WHEN keep_h THEN 1 ELSE 0 END) AS BIGINT)
        |          AS keep_heuristic,
        |        CAST(sum(CASE WHEN keep_m = keep_h THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_agree
        |      FROM g)
        |SELECT n AS n_docs, keep_model, keep_heuristic, n_agree,
        |       round(CAST(n_agree AS DOUBLE) / n, 4) AS po,
        |       round((CAST(keep_model AS DOUBLE) * keep_heuristic
        |           + CAST(n - keep_model AS DOUBLE) * (n - keep_heuristic))
        |         / (CAST(n AS DOUBLE) * n), 4) AS pe,
        |       CASE WHEN (CAST(keep_model AS DOUBLE) * keep_heuristic
        |           + CAST(n - keep_model AS DOUBLE) * (n - keep_heuristic))
        |         / (CAST(n AS DOUBLE) * n) < 1.0
        |         THEN round((CAST(n_agree AS DOUBLE) / n
        |             - (CAST(keep_model AS DOUBLE) * keep_heuristic
        |               + CAST(n - keep_model AS DOUBLE)
        |                 * (n - keep_heuristic))
        |               / (CAST(n AS DOUBLE) * n))
        |           / (1.0 - (CAST(keep_model AS DOUBLE) * keep_heuristic
        |               + CAST(n - keep_model AS DOUBLE)
        |                 * (n - keep_heuristic))
        |               / (CAST(n AS DOUBLE) * n)), 4)
        |         ELSE NULL END AS kappa
        |FROM c""".stripMargin,
    // n-gram novelty: first corpus occurrence (min doc_id) per
    // distinct word-3-gram, per-doc novel fraction
    // n-gram novelty: first corpus occurrence (min doc_id) per
    // distinct word-3-gram, per-doc novel fraction
    "text_ngram_novelty" ->
      s"""WITH $shingleCte,
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |f AS (SELECT s, min(doc_id) AS first_doc FROM shx GROUP BY 1)
         |SELECT shx.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |       CAST(sum(CASE WHEN f.first_doc = shx.doc_id
         |                     THEN 1 ELSE 0 END) AS BIGINT)
         |         AS novel_grams,
         |       round(sum(CASE WHEN f.first_doc = shx.doc_id
         |                      THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
         |         AS novelty
         |FROM shx JOIN f ON f.s = shx.s
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "text_top_terms" ->
      """WITH u AS (SELECT DISTINCT lang, doc_id, tok FROM
        |             (SELECT lang, doc_id,
        |                     unnest(string_split(text, ' ')) AS tok
        |              FROM documents)),
        |df AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS df
        |       FROM u GROUP BY 1, 2),
        |r AS (SELECT lang, tok, df,
        |             row_number() OVER (PARTITION BY lang
        |                                ORDER BY df DESC, tok) AS rk
        |      FROM df)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, tok, df
        |FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,
    // maintained daily rollup: the oracle is the one-shot rebuild
    // (micro-unit longs keep the maintained == rebuilt fold exact),
  )
}
