package graft

/** Store-family oracle SQL — split verbatim from SparkEntry
  * (r12, r11 verdict #7). The registry stays in SparkEntry;
  * these maps are its DuckDB mirrors, byte-identical to the
  * pre-split strings.
  */
private[graft] object OracleStore {
  import OracleCtes._

  val sql: Map[String, String] = Map(
    // time travel through the SCD2 intervals: a past state is a
    // filter on the history, not a replay — both slices from one
    // interval build
    "vdb_time_travel" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), CAST(2 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), CAST(3 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 14 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 300 AS BIGINT), CAST(4 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 21 = 0),
        |chg AS (SELECT id, label, version,
        |          lag(label) OVER (PARTITION BY id ORDER BY version) AS prev
        |        FROM log),
        |scd AS (SELECT id, label, version AS valid_from,
        |          lead(version) OVER (PARTITION BY id ORDER BY version)
        |            AS valid_to
        |        FROM chg WHERE prev IS NULL OR prev <> label)
        |SELECT CAST(2 AS BIGINT) AS asof_v, id, label FROM scd
        |WHERE valid_from <= 2 AND (valid_to IS NULL OR valid_to > 2)
        |UNION ALL
        |SELECT CAST(3 AS BIGINT) AS asof_v, id, label FROM scd
        |WHERE valid_from <= 3 AND (valid_to IS NULL OR valid_to > 3)
        |ORDER BY asof_v, id""".stripMargin,
    // vdb_knn_sq8 is oracled despite being "approximate": the
    // quantization grid, the shortlist rule (top-40 by code-space L2,
    // ties by id), and the exact rerank are all deterministic pure
    // functions DuckDB replicates bit-for-bit — integer-literal
    // arithmetic only (DuckDB decimal literals would silently switch
    // the math to DECIMAL), same operation order, same sequential
    // list_sum fold as the codegen loop's accumulator.
    "wal_json_replay" -> walReplayOracle,
    "wal_delete_replay" -> walDeleteReplayOracle,
    "wal_compact_replay" -> walCompactReplayOracle,
    "wal_binary_replay" -> walReplayOracle,
    "wal_dsv2_replay" -> walReplayOracle,
    "wal_file_replay" -> walReplayOracle,
    // the state the streaming exact-dedup converges to (first copy
    // per fingerprint wins; n_copies = suppressed + 1) on the
    // planted-duplicate corpus — DedupStreamSpec proves the stream
    // reaches exactly this state
    // the state the streaming exact-dedup converges to (first copy
    // per fingerprint wins; n_copies = suppressed + 1) on the
    // planted-duplicate corpus — DedupStreamSpec proves the stream
    // reaches exactly this state
    "stream_dedup_state" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT md5(text) AS fp, min(doc_id) AS first_id,
        |       CAST(count(*) AS BIGINT) AS n_copies
        |FROM corpus GROUP BY 1 ORDER BY fp""".stripMargin,
    "stream_wal_state" ->
      """WITH agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |         round(sum(value), 4) AS sum_value
        |  FROM events GROUP BY user_id),
        |l AS (
        |  SELECT user_id, value, ts, event_id FROM (
        |    SELECT user_id, value, ts, event_id,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events) WHERE rk = 1)
        |SELECT agg.user_id, agg.n_events, agg.sum_value,
        |       round(l.value, 4) AS last_value,
        |       CAST(epoch_ns(l.ts) // 1000000 AS BIGINT) AS last_ts,
        |       l.event_id AS last_event_id
        |FROM agg JOIN l USING (user_id) ORDER BY user_id""".stripMargin,
    "stream_window_daily" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sv
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "stream_interval_join" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS c_id, ts AS c_ts
        |      FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p_id, c_id,
        |       epoch_us(p_ts) - epoch_us(c_ts) AS micros_before
        |FROM p JOIN c ON p.user_id = c.user_id
        |WHERE c_ts >= p_ts - INTERVAL 6 HOUR AND c_ts <= p_ts
        |ORDER BY p_id, c_id""".stripMargin,
    // session_window semantics: merge while gap < 30 min (so a new
    // session starts at gap >= 1800 — note events_sessionize's lag
    // formulation uses gap > 1800; window END = last event + gap
    // session_window semantics: merge while gap < 30 min (so a new
    // session starts at gap >= 1800 — note events_sessionize's lag
    // formulation uses gap > 1800; window END = last event + gap
    "stream_session_window" ->
      """WITH o AS (SELECT user_id, ts, value, event_id,
        |             lag(ts) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS pts
        |           FROM events),
        |f AS (SELECT user_id, ts, value, event_id,
        |        CASE WHEN pts IS NULL OR epoch(ts) - epoch(pts) >= 1800
        |             THEN 1 ELSE 0 END AS ns
        |      FROM o),
        |g AS (SELECT user_id, ts, value,
        |        sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM f)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
        |         AS session_end,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(value), 4) AS sum_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "vdb_insert" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 7 = 0)
        |SELECT id, CAST(count(*) AS BIGINT) AS n_rows,
        |       min(label) AS min_label, max(label) AS max_label
        |FROM log GROUP BY id ORDER BY id""".stripMargin,
    // ordered mixed batch: upsert v1 (%6), patch v2 (%9), delete v3
    // (%15), upsert v4 (%21). Closed-form mirror of the general
    // fold: the last content version must outrun the last delete;
    // a patch survives only if it post-dates both. Independent
    // derivation — the Spark side runs the generic changelog fold.
    "vdb_batch_update" ->
      """WITH f AS (SELECT doc_id, lang, source, n_chars,
        |    (doc_id % 6 = 0) AS u1, (doc_id % 9 = 0) AS p2,
        |    (doc_id % 15 = 0) AS d3, (doc_id % 21 = 0) AS u4
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN u4 THEN 'bb' WHEN u1 THEN 'aa'
        |       ELSE lang END AS lang,
        |  CASE WHEN u4 THEN 'up4'
        |       WHEN p2 AND NOT d3 THEN 'patched2'
        |       WHEN u1 THEN 'up1' ELSE source END AS source,
        |  CASE WHEN u4 THEN n_chars + 4000
        |       WHEN u1 THEN n_chars + 1000
        |       ELSE n_chars END AS n_chars
        |FROM f WHERE NOT (d3 AND NOT u4)
        |ORDER BY doc_id""".stripMargin,
    // set-payload PATCH: a NULL patch field leaves the base value
    // (coalesce merge), unpatched ids pass through
    "vdb_set_payload" ->
      """WITH p AS (SELECT doc_id,
        |             CASE WHEN doc_id % 18 = 0 THEN 'xx' END AS lang_p,
        |             'patched' AS source_p
        |           FROM documents WHERE doc_id % 9 = 0)
        |SELECT d.doc_id, coalesce(p.lang_p, d.lang) AS lang,
        |       coalesce(p.source_p, d.source) AS source, d.n_chars
        |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // delete-payload: clear (%13) NULLs every payload key, delete
    // (%7) NULLs only the listed 'source'; all other rows/fields
    // pass through — NULL here is REMOVAL, not PATCH-keep
    "vdb_delete_payload" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS lang,
        |       CASE WHEN doc_id % 13 = 0 OR doc_id % 7 = 0 THEN NULL
        |            ELSE source END AS source,
        |       CASE WHEN doc_id % 13 = 0 THEN NULL
        |            ELSE n_chars END AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // collection-level facet counts under a filter: top-5 values per
    // facet key by (count desc, value asc); NULL values absent
    "vdb_facet_counts" ->
      """WITH f AS (SELECT lang, source FROM documents
        |           WHERE n_chars >= 300),
        |u AS (SELECT 'lang' AS facet, lang AS value FROM f
        |      UNION ALL SELECT 'source', source FROM f),
        |c AS (SELECT facet, value, count(*) AS n FROM u
        |      WHERE value IS NOT NULL GROUP BY facet, value),
        |r AS (SELECT facet, value, n,
        |        row_number() OVER (PARTITION BY facet
        |          ORDER BY n DESC, value) AS rk
        |      FROM c)
        |SELECT facet, rk, value, n FROM r
        |WHERE rk <= 5 ORDER BY facet, rk""".stripMargin,
    "vdb_upsert" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), CAST(2 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 7 = 0),
        |r AS (SELECT id, label, version,
        |             row_number() OVER (PARTITION BY id ORDER BY version DESC) AS rk
        |      FROM log)
        |SELECT id, label, version FROM r WHERE rk = 1 ORDER BY id""".stripMargin,
    // compare-and-set: update applies only where the base still
    // holds the expected version (id%3==1 → version 2); accepted
    // rows bump the version, rejected keys keep the base row
    // compare-and-set: update applies only where the base still
    // holds the expected version (id%3==1 → version 2); accepted
    // rows bump the version, rejected keys keep the base row
    "vdb_upsert_cas" ->
      """WITH base AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |                CAST(1 + vec_id % 3 AS BIGINT) AS version
        |              FROM embeddings),
        |upd AS (SELECT vec_id AS id,
        |          CAST(label + 500 AS BIGINT) AS label,
        |          CAST(2 AS BIGINT) AS expected
        |        FROM embeddings WHERE vec_id % 5 = 0),
        |acc AS (SELECT upd.id, upd.label, base.version + 1 AS version
        |        FROM upd JOIN base USING (id)
        |        WHERE base.version = upd.expected),
        |log AS (SELECT * FROM base UNION ALL SELECT * FROM acc),
        |r AS (SELECT id, label, version,
        |        row_number() OVER (PARTITION BY id
        |          ORDER BY version DESC) AS rk
        |      FROM log)
        |SELECT id, label, version FROM r WHERE rk = 1 ORDER BY id""".stripMargin,
    // SCD2 history of the 4-epoch upsert log: change-collapse via
    // lag (v3 re-asserts v2 and must vanish), intervals via lead
    // SCD2 history of the 4-epoch upsert log: change-collapse via
    // lag (v3 re-asserts v2 and must vanish), intervals via lead
    "scd2_intervals" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), CAST(2 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), CAST(3 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 14 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 300 AS BIGINT), CAST(4 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 21 = 0),
        |chg AS (SELECT id, label, version,
        |          lag(label) OVER (PARTITION BY id ORDER BY version) AS prev
        |        FROM log),
        |scd AS (SELECT id, label, version AS valid_from,
        |          lead(version) OVER (PARTITION BY id ORDER BY version)
        |            AS valid_to
        |        FROM chg WHERE prev IS NULL OR prev <> label)
        |SELECT id, label, valid_from, valid_to,
        |       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |         AS is_current
        |FROM scd ORDER BY id, valid_from""".stripMargin,
    // tombstone LWW: the 6-epoch log (4 upsert epochs + v5 delete
    // wave %5 + v6 resurrection wave %15); a key whose winner is a
    // tombstone is absent, a resurrected key carries its v6 value
    // tombstone LWW: the 6-epoch log (4 upsert epochs + v5 delete
    // wave %5 + v6 resurrection wave %15); a key whose winner is a
    // tombstone is absent, a resurrected key carries its v6 value
    "vdb_delete" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version, 'upsert' AS op
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), 2, 'upsert'
        |  FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), 3, 'upsert'
        |  FROM embeddings WHERE vec_id % 14 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 300 AS BIGINT), 4, 'upsert'
        |  FROM embeddings WHERE vec_id % 21 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(NULL AS BIGINT), 5, 'delete'
        |  FROM embeddings WHERE vec_id % 5 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 500 AS BIGINT), 6, 'upsert'
        |  FROM embeddings WHERE vec_id % 15 = 0),
        |r AS (SELECT id, label, version, op,
        |             row_number() OVER (PARTITION BY id
        |               ORDER BY version DESC) AS rk
        |      FROM log)
        |SELECT id, label, version FROM r
        |WHERE rk = 1 AND op <> 'delete' ORDER BY id""".stripMargin,
    // snapshot diff v≤3 → v≤6 over the tombstone log + a v4
    // late-arrival wave (%11 re-keyed +400000): two LWW states,
    // full-outer joined; value semantics (identical attrs = no row)
    // snapshot diff v≤3 → v≤6 over the tombstone log + a v4
    // late-arrival wave (%11 re-keyed +400000): two LWW states,
    // full-outer joined; value semantics (identical attrs = no row)
    "vdb_snapshot_diff" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version, 'upsert' AS op
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), 2, 'upsert'
        |  FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), 3, 'upsert'
        |  FROM embeddings WHERE vec_id % 14 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 300 AS BIGINT), 4, 'upsert'
        |  FROM embeddings WHERE vec_id % 21 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(NULL AS BIGINT), 5, 'delete'
        |  FROM embeddings WHERE vec_id % 5 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 500 AS BIGINT), 6, 'upsert'
        |  FROM embeddings WHERE vec_id % 15 = 0
        |  UNION ALL
        |  SELECT vec_id + 400000, CAST(label + 700 AS BIGINT), 4, 'upsert'
        |  FROM embeddings WHERE vec_id % 11 = 0),
        |ra AS (SELECT id, label, version, op, row_number() OVER (
        |         PARTITION BY id ORDER BY version DESC) AS rk
        |       FROM log WHERE version <= 3),
        |sa AS (SELECT id, label AS old_label, version AS old_version
        |       FROM ra WHERE rk = 1 AND op <> 'delete'),
        |rb AS (SELECT id, label, version, op, row_number() OVER (
        |         PARTITION BY id ORDER BY version DESC) AS rk
        |       FROM log WHERE version <= 6),
        |sb AS (SELECT id, label AS new_label, version AS new_version
        |       FROM rb WHERE rk = 1 AND op <> 'delete'),
        |d AS (SELECT COALESCE(sa.id, sb.id) AS id,
        |        CASE WHEN sa.id IS NULL THEN 'added'
        |             WHEN sb.id IS NULL THEN 'deleted'
        |             WHEN old_label IS DISTINCT FROM new_label
        |               THEN 'changed' END AS change,
        |        old_label, new_label, old_version, new_version
        |      FROM sa FULL OUTER JOIN sb ON sa.id = sb.id)
        |SELECT id, change, old_label, new_label, old_version, new_version
        |FROM d WHERE change IS NOT NULL ORDER BY id""".stripMargin,
    // SCD2 with tombstones: deletes seal valid_to without opening a
    // live interval; the change-collapse compares (label, op) so a
    // resurrection always opens a fresh interval
    // SCD2 with tombstones: deletes seal valid_to without opening a
    // live interval; the change-collapse compares (label, op) so a
    // resurrection always opens a fresh interval
    "scd2_tombstones" ->
      (scd2TombCtes +
        """
          |SELECT id, label, valid_from, valid_to,
          |       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
          |         AS is_current
          |FROM scd WHERE op <> 'delete' ORDER BY id, valid_from"""
        .stripMargin),
    // retention at horizon 4: closed-before-horizon intervals gone,
    // open and post-horizon intervals identical to the full history
    // retention at horizon 4: closed-before-horizon intervals gone,
    // open and post-horizon intervals identical to the full history
    "scd2_retention" ->
      (scd2TombCtes +
        """
          |SELECT id, label, valid_from, valid_to,
          |       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
          |         AS is_current
          |FROM scd WHERE op <> 'delete'
          |  AND (valid_to IS NULL OR valid_to > 4)
          |ORDER BY id, valid_from"""
        .stripMargin),
    "vdb_remove" ->
      """SELECT CAST(label AS BIGINT) AS label,
        |       CAST(count(*) AS BIGINT) AS n,
        |       min(vec_id) AS min_id, max(vec_id) AS max_id
        |FROM embeddings e
        |WHERE NOT EXISTS (SELECT 1 FROM embeddings r
        |                  WHERE r.vec_id % 10 = 0 AND r.vec_id = e.vec_id)
        |GROUP BY 1 ORDER BY label""".stripMargin,
    "vdb_filter_index_build" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS card,
        |       min(vec_id) AS min_id, max(vec_id) AS max_id
        |FROM embeddings GROUP BY 1 ORDER BY label""".stripMargin,
    // JSON-payload filter index (the reference filter.md roadmap's
    // "json index" line): per extracted $.k value, cardinality + id
    // range; malformed/missing payloads are NOT indexed (json_valid
    // guard — Spark's schema-on-read NULL mirror)
    "vdb_filter_index_json" ->
      """WITH p AS (SELECT event_id,
        |             TRY_CAST(CASE WHEN json_valid(props) THEN
        |               json_extract_string(props, '$.k') END AS BIGINT)
        |               AS k
        |           FROM events)
        |SELECT k, CAST(count(*) AS BIGINT) AS card,
        |       min(event_id) AS min_id, max(event_id) AS max_id
        |FROM p WHERE k IS NOT NULL
        |GROUP BY 1 ORDER BY k""".stripMargin,
    // array-value inverted index: one posting row per tag value over
    // the exploded synthetic tags (unnest ≡ Spark's explode); card
    // counts postings (a doc whose mods collide contributes one per
    // slot, same on both engines)
    "vdb_filter_index_array" ->
      """WITH p AS (SELECT unnest([vec_id % 7, vec_id % 11,
        |             vec_id % 13]) AS tag, vec_id
        |           FROM embeddings)
        |SELECT tag, CAST(count(*) AS BIGINT) AS card,
        |       min(vec_id) AS min_id, max(vec_id) AS max_id
        |FROM p GROUP BY 1 ORDER BY tag""".stripMargin,
    "vdb_snapshot_replay" ->
      """WITH agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |         round(sum(value), 4) AS sum_value
        |  FROM events GROUP BY user_id),
        |l AS (
        |  SELECT user_id, value FROM (
        |    SELECT user_id, value,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events) WHERE rk = 1)
        |SELECT agg.user_id, agg.n_events, agg.sum_value,
        |       round(l.value, 4) AS last_value
        |FROM agg JOIN l USING (user_id) ORDER BY user_id""".stripMargin,
  )
}
