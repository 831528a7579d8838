package graft

/** Events-family oracle SQL — split verbatim from SparkEntry
  * (r12, r11 verdict #7). The registry stays in SparkEntry;
  * these maps are its DuckDB mirrors, byte-identical to the
  * pre-split strings.
  */
private[graft] object OracleEvents {
  import OracleCtes._

  val sql: Map[String, String] = Map(
    // gap regularity from exact integer moments (n, Σg, Σg²); the
    // (sec, event_id) lead order pins equal-timestamp runs
    "events_bot_score" ->
      """WITH e AS (SELECT user_id, event_id,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |           FROM events),
        |g AS (SELECT user_id, lead(sec) OVER (PARTITION BY user_id
        |        ORDER BY sec, event_id) - sec AS gap FROM e),
        |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |        sum(gap) AS sg, sum(gap * gap) AS sg2
        |      FROM g WHERE gap IS NOT NULL
        |      GROUP BY 1 HAVING count(*) >= 2),
        |r AS (SELECT user_id, n_gaps, sg * 1.0 / n_gaps AS mean_gap,
        |        CASE WHEN sg > 0
        |          THEN round(sqrt((sg2 * 1.0 * n_gaps - sg * 1.0 * sg)
        |            / (n_gaps * 1.0 * (n_gaps - 1)))
        |            / (sg * 1.0 / n_gaps), 4)
        |          ELSE 0.0 END AS cvr
        |      FROM m)
        |SELECT user_id, n_gaps, round(mean_gap, 2) AS mean_gap_s,
        |       cvr AS cv_gap, cvr < 0.5 AS is_regular
        |FROM r ORDER BY user_id""".stripMargin,
    // seasonal-naive backtest: dense zero-filled grid from DATA
    // bounds, lag-7 prediction, integer-exact absolute errors
    "events_forecast_naive" ->
      """WITH ev AS (SELECT event_type,
        |              date_diff('day', DATE '1970-01-01',
        |                CAST(ts AS DATE)) AS d
        |            FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT ty.event_type, g.d
        |         FROM ty CROSS JOIN
        |           (SELECT unnest(generate_series(b.lo, b.hi)) AS d
        |            FROM b) g),
        |dense AS (SELECT g.event_type, g.d, coalesce(daily.n, 0) AS n
        |          FROM grid g LEFT JOIN daily
        |            ON g.event_type = daily.event_type
        |            AND g.d = daily.d),
        |lagd AS (SELECT event_type, d, n,
        |           lag(n, 7) OVER (PARTITION BY event_type ORDER BY d)
        |             AS pred
        |         FROM dense)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(abs(n - pred)) AS BIGINT) AS total_abs_err,
        |       round(sum(abs(n - pred)) * 1.0 / count(*), 4) AS mae
        |FROM lagd WHERE pred IS NOT NULL
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    // lag-7 Pearson autocorrelation over the same dense grid — exact
    // integer moments, DOUBLE numerators multiplied inside the sqrt
    // lag-7 Pearson autocorrelation over the same dense grid — exact
    // integer moments, DOUBLE numerators multiplied inside the sqrt
    "events_autocorr7" ->
      """WITH ev AS (SELECT event_type,
        |              date_diff('day', DATE '1970-01-01',
        |                CAST(ts AS DATE)) AS d
        |            FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT ty.event_type, g.d
        |         FROM ty CROSS JOIN
        |           (SELECT unnest(generate_series(b.lo, b.hi)) AS d
        |            FROM b) g),
        |dense AS (SELECT g.event_type, g.d, coalesce(daily.n, 0) AS y
        |          FROM grid g LEFT JOIN daily
        |            ON g.event_type = daily.event_type
        |            AND g.d = daily.d),
        |lagd AS (SELECT event_type, y,
        |           lag(y, 7) OVER (PARTITION BY event_type ORDER BY d)
        |             AS x
        |         FROM dense),
        |mo AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |       FROM lagd WHERE x IS NOT NULL GROUP BY 1)
        |SELECT event_type, k AS n_days,
        |       round(CAST(CAST(k AS HUGEINT) * sxy
        |           - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |         / sqrt(CAST(CAST(k AS HUGEINT) * sxx
        |             - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |           * CAST(CAST(k AS HUGEINT) * syy
        |             - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 4) AS r_lag
        |FROM mo
        |WHERE CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
        |  AND CAST(k AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
        |ORDER BY event_type""".stripMargin,
    // cross-series Pearson: dense-grid pair join, autocorr moments
    // cross-series Pearson: dense-grid pair join, autocorr moments
    "events_series_corr" ->
      """WITH ev AS (SELECT event_type,
        |              date_diff('day', DATE '1970-01-01',
        |                CAST(ts AS DATE)) AS d
        |            FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT ty.event_type, g.d
        |         FROM ty CROSS JOIN
        |           (SELECT unnest(generate_series(b.lo, b.hi)) AS d
        |            FROM b) g),
        |dense AS (SELECT g.event_type, g.d, coalesce(daily.n, 0) AS v
        |          FROM grid g LEFT JOIN daily
        |            ON g.event_type = daily.event_type
        |            AND g.d = daily.d),
        |prs AS (SELECT a.event_type AS type_a, bb.event_type AS type_b,
        |          a.v AS x, bb.v AS y
        |        FROM dense a JOIN dense bb ON a.d = bb.d
        |          AND a.event_type < bb.event_type),
        |mo AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS k,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |       FROM prs GROUP BY 1, 2)
        |SELECT type_a, type_b, k AS n_days,
        |       round(CAST(CAST(k AS HUGEINT) * sxy
        |           - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |         / sqrt(CAST(CAST(k AS HUGEINT) * sxx
        |             - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |           * CAST(CAST(k AS HUGEINT) * syy
        |             - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 4) AS r
        |FROM mo
        |WHERE CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
        |  AND CAST(k AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
        |ORDER BY type_a, type_b""".stripMargin,
    // Benford first-digit audit: exact counts, 6dp literal
    // expectations interpolated from the SAME Scala seq the Spark
    // when-chain uses
    // Benford first-digit audit: exact counts, 6dp literal
    // expectations interpolated from the SAME Scala seq the Spark
    // when-chain uses
    "events_benford" -> {
      val lits = graft.operators.Analytics.benfordP
        .map { case (d, p) => f"($d, CAST($p%.6f AS DOUBLE))" }
        .mkString(", ")
      s"""WITH m AS (SELECT CAST(round(value * 100) AS BIGINT) AS mc
         |           FROM events),
         |dg AS (SELECT CAST(substr(CAST(mc AS VARCHAR), 1, 1) AS BIGINT)
         |         AS digit
         |       FROM m WHERE mc > 0),
         |cnt AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
         |        FROM dg GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM dg),
         |bp(digit, p) AS (VALUES $lits)
         |SELECT cnt.digit AS digit, cnt.n_obs,
         |       round(CAST(cnt.n_obs AS DOUBLE) / tot.total, 4) AS share,
         |       bp.p AS benford_p,
         |       round(CAST(cnt.n_obs AS DOUBLE) / tot.total - bp.p, 4)
         |         AS excess
         |FROM cnt JOIN bp ON cnt.digit = bp.digit CROSS JOIN tot
         |ORDER BY digit""".stripMargin
    },
    // supplier-revenue HHI per nation: Σc² and T² through HUGEINT
    // (the Spark side's DECIMAL(38,0)), one double division
    // event-transition matrix: per-user lag pairs, row-normalized
    // top paths: trigram sequences per user, counted then ranked over
    // the states³-sized path table
    "events_top_paths" ->
      """WITH p AS (SELECT user_id, event_type AS t1,
        |             lead(event_type, 1) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS t2,
        |             lead(event_type, 2) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS t3
        |           FROM events),
        |g AS (SELECT t1 || ' > ' || t2 || ' > ' || t3 AS path,
        |             CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE t3 IS NOT NULL GROUP BY 1),
        |r AS (SELECT path, n, row_number() OVER (ORDER BY n DESC, path)
        |        AS rank FROM g)
        |SELECT rank, path, n FROM r WHERE rank <= 10
        |ORDER BY rank""".stripMargin,
    "events_transitions" ->
      """WITH p AS (SELECT user_id, event_type,
        |             lag(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS from_type
        |           FROM events),
        |g AS (SELECT from_type, event_type AS to_type,
        |             CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n
        |      FROM g GROUP BY 1)
        |SELECT g.from_type, g.to_type, g.n,
        |       round(CAST(g.n AS DOUBLE) / t.row_n, 4) AS p
        |FROM g JOIN t ON g.from_type = t.from_type
        |ORDER BY g.from_type, g.to_type""".stripMargin,
    // schema-on-read: props JSON parsed inside the scan projection
    // schema-on-read: props JSON parsed inside the scan projection
    "events_json_props" ->
      """SELECT event_type,
        |       CAST(TRY_CAST(json_extract_string(
        |           CASE WHEN json_valid(props) THEN props END, '$.k')
        |           AS BIGINT)
        |         // 25 AS BIGINT) AS k_band,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, k_band""".stripMargin,
    // filtered indexed search: the same probe set, members restricted
    // by the metadata predicate BEFORE scoring (reference
    // filter_index.cc bitmaps under the approximate path)
    // adaptive filtered search: the PLANNER is mirrored too — the
    // oracle computes the same STATS-DRIVEN estimate (exact total +
    // md5-hash-sample match count scaled by 8, floored at 1 — the
    // planner sidecar's semantics) and gates the same two branch
    // CTEs on est·10 < total, so a branch-choice divergence is a
    // hash mismatch, not a silent plan difference
    // funnel: stage k = first qualifying event at/after stage k-1's
    // time, per user; counts integer-exact, monotone by construction
    // multi-touch attribution: user-keyed 7-day band join, last
    // touch by (ts, event_id), linear credit summed per distinct
    // touch count (integer counts first, bounded float reduction)
    "events_attribution" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT event_id AS t_id, user_id, ts AS t_ts,
        |             event_type AS t_type
        |      FROM events
        |      WHERE event_type IN ('view', 'click', 'signup')),
        |pt AS (SELECT p.p_id, t.t_id, t.t_type, t.t_ts
        |       FROM p JOIN t ON p.user_id = t.user_id
        |         AND t.t_ts < p.p_ts
        |         AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
        |per AS (SELECT p_id, CAST(count(*) AS BIGINT) AS n_touch
        |        FROM pt GROUP BY 1),
        |lastt AS (SELECT p_id, t_type FROM (
        |            SELECT p_id, t_type,
        |              row_number() OVER (PARTITION BY p_id
        |                ORDER BY t_ts DESC, t_id DESC) AS rn
        |            FROM pt) WHERE rn = 1),
        |ln0 AS (SELECT pt.t_type, per.n_touch,
        |          CAST(count(*) AS BIGINT) AS c
        |        FROM pt JOIN per USING (p_id) GROUP BY 1, 2),
        |lin AS (SELECT t_type AS event_type,
        |          CAST(sum(c) AS BIGINT) AS touches,
        |          sum(c * 1.0 / n_touch) AS lc
        |        FROM ln0 GROUP BY 1),
        |la AS (SELECT t_type AS event_type,
        |         CAST(count(*) AS BIGINT) AS last_touch
        |       FROM lastt GROUP BY 1),
        |d AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p
        |      WHERE NOT EXISTS (SELECT 1 FROM per
        |                        WHERE per.p_id = p.p_id))
        |SELECT coalesce(lin.event_type, la.event_type) AS event_type,
        |       CAST(coalesce(lin.touches, 0) AS BIGINT) AS touches,
        |       CAST(coalesce(la.last_touch, 0) AS BIGINT)
        |         AS last_touch,
        |       round(coalesce(lin.lc, 0), 4) AS linear_credit
        |FROM lin FULL JOIN la ON lin.event_type = la.event_type
        |UNION ALL
        |SELECT 'direct', CAST(0 AS BIGINT), n, round(n * 1.0, 4)
        |FROM d
        |ORDER BY event_type""".stripMargin,
    // funnel x experiment: two-proportion z per transition on the
    // shared staged-funnel definition, pooled p-hat
    // funnel x experiment: two-proportion z per transition on the
    // shared staged-funnel definition, pooled p-hat
    "events_funnel_ab" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        |      GROUP BY 1),
        |g AS (SELECT v.user_id % 2 AS variant,
        |        CAST(count(*) AS BIGINT) AS nv,
        |        CAST(count(c.user_id) AS BIGINT) AS nc,
        |        CAST(count(p.user_id) AS BIGINT) AS np
        |      FROM v LEFT JOIN c ON v.user_id = c.user_id
        |      LEFT JOIN p ON v.user_id = p.user_id GROUP BY 1),
        |tr AS (SELECT variant, 'view_to_click' AS transition,
        |         nv AS n, nc AS conv FROM g
        |       UNION ALL
        |       SELECT variant, 'click_to_purchase', nc, np FROM g),
        |j AS (SELECT a.transition, a.n AS n_a, a.conv AS conv_a,
        |        b.n AS n_b, b.conv AS conv_b,
        |        CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n) AS ph
        |      FROM tr a JOIN tr b ON a.transition = b.transition
        |        AND a.variant = 0 AND b.variant = 1)
        |SELECT transition, n_a, conv_a, n_b, conv_b,
        |       round(CAST(conv_a AS DOUBLE) / n_a, 4) AS rate_a,
        |       round(CAST(conv_b AS DOUBLE) / n_b, 4) AS rate_b,
        |       CASE WHEN conv_a + conv_b > 0
        |             AND conv_a + conv_b < n_a + n_b
        |         THEN round((CAST(conv_a AS DOUBLE) / n_a
        |             - CAST(conv_b AS DOUBLE) / n_b)
        |           / sqrt(ph * (1.0 - ph)
        |             * (CAST(1 AS DOUBLE) / n_a
        |               + CAST(1 AS DOUBLE) / n_b)), 4)
        |         ELSE 0.0 END AS z
        |FROM j ORDER BY transition""".stripMargin,
    "events_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        |      GROUP BY 1),
        |u AS (SELECT 1 AS stage, 'view' AS name, user_id FROM v
        |      UNION ALL SELECT 2, 'view_click', user_id FROM c
        |      UNION ALL SELECT 3, 'view_click_purchase', user_id FROM p)
        |SELECT CAST(stage AS BIGINT) AS stage, name,
        |       CAST(count(*) AS BIGINT) AS users
        |FROM u GROUP BY 1, 2 ORDER BY stage""".stripMargin,
    // dow seasonality index over the dense zero-filled grid; ISO
    // weekday from epoch-day arithmetic ((d + 3) % 7 + 1)
    // dow seasonality index over the dense zero-filled grid; ISO
    // weekday from epoch-day arithmetic ((d + 3) % 7 + 1)
    "events_dow_seasonality" ->
      """WITH ev AS (SELECT event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |       FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |g AS (SELECT ty.event_type, gs.d
        |      FROM ty CROSS JOIN
        |        (SELECT unnest(range(b.lo, b.hi + 1)) AS d FROM b) gs),
        |dense AS (SELECT g.event_type, g.d,
        |        coalesce(daily.n, 0) AS n,
        |        (g.d + 3) % 7 + 1 AS dow
        |       FROM g LEFT JOIN daily
        |         ON g.event_type = daily.event_type AND g.d = daily.d),
        |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS st,
        |        CAST(count(*) AS BIGINT) AS nd
        |       FROM dense GROUP BY 1),
        |dw AS (SELECT event_type, dow, CAST(sum(n) AS BIGINT) AS sd,
        |        CAST(count(*) AS BIGINT) AS ndw
        |       FROM dense GROUP BY 1, 2)
        |SELECT dw.event_type, CAST(dw.dow AS BIGINT) AS dow,
        |  round(CAST(dw.sd AS DOUBLE) / dw.ndw, 4) AS dow_mean,
        |  round((CAST(dw.sd AS DOUBLE) / dw.ndw)
        |    / (CAST(tot.st AS DOUBLE) / tot.nd), 4) AS seasonal_index
        |FROM dw JOIN tot USING (event_type)
        |ORDER BY event_type, dow""".stripMargin,
    // cohort LTV triangle: exact-cents cells, cumulative window over
    // each cohort's months-span frame
    // absence alert: trailing zero-run vs longest internal silence,
    // gaps-and-islands over the dense grid
    "events_absence_alert" ->
      """WITH ev AS (SELECT event_type,
        |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |               AS d
        |           FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |meta AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |tys AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, g.d, m.hi
        |         FROM tys t CROSS JOIN meta m CROSS JOIN
        |           (SELECT unnest(range(lo, hi + 1)) AS d FROM meta) g),
        |dense AS (SELECT grid.event_type, grid.d, grid.hi,
        |            coalesce(daily.n, 0) AS n
        |          FROM grid LEFT JOIN daily USING (event_type, d)),
        |zr AS (SELECT event_type, d, hi,
        |         d - row_number() OVER (PARTITION BY event_type
        |           ORDER BY d) AS grp
        |       FROM dense WHERE n = 0),
        |runs AS (SELECT event_type, grp, CAST(count(*) AS BIGINT)
        |           AS len,
        |           max(d) AS run_end, max(hi) AS hi
        |         FROM zr GROUP BY 1, 2),
        |pt AS (SELECT event_type,
        |         CAST(sum(CASE WHEN run_end = hi THEN len ELSE 0 END)
        |           AS BIGINT) AS trailing_silent,
        |         CAST(max(CASE WHEN run_end < hi THEN len ELSE 0 END)
        |           AS BIGINT) AS max_internal_gap
        |       FROM runs GROUP BY 1)
        |SELECT t.event_type,
        |       coalesce(pt.trailing_silent, 0) AS trailing_silent,
        |       coalesce(pt.max_internal_gap, 0) AS max_internal_gap,
        |       (coalesce(pt.trailing_silent, 0) >
        |         coalesce(pt.max_internal_gap, 0)) AS alert
        |FROM tys t LEFT JOIN pt USING (event_type)
        |ORDER BY t.event_type""".stripMargin,
    // sourcing breadth: supplier-count buckets, revenue share per
    // sample-size calculator from exact cents moments; z constants
    // as DOUBLE on both engines, ceil of bit-identical doubles
    "events_power_analysis" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(m) AS BIGINT) AS sx,
        |        sum(CAST(m AS HUGEINT) * m) AS qx
        |      FROM (SELECT event_type,
        |              CAST(round(value * 100) AS BIGINT) AS m
        |            FROM events) GROUP BY 1),
        |d AS (SELECT event_type, n,
        |        CAST(sx AS DOUBLE) / n / CAST(100.0 AS DOUBLE) AS mean,
        |        CAST(CAST(n AS HUGEINT) * qx
        |            - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |          / CAST(n * (n - 1) AS DOUBLE)
        |          / CAST(10000.0 AS DOUBLE) AS vr,
        |        CAST(n AS HUGEINT) * qx - CAST(sx AS HUGEINT) * sx
        |          AS vnum,
        |        CAST(n AS HUGEINT) * (n - 1) * 10000 AS vden
        |      FROM g WHERE n > 1)
        |SELECT event_type, n AS n_obs, round(mean, 4) AS mean_value,
        |  ((vnum * 20000 + vden) // (vden * 2)) / 10000.0 AS variance,
        |  round(mean * CAST(0.05 AS DOUBLE), 4) AS mde,
        |  CAST(ceil(CAST(2.0 AS DOUBLE) * vr
        |    * (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
        |    * (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
        |    / ((mean * CAST(0.05 AS DOUBLE))
        |       * (mean * CAST(0.05 AS DOUBLE)))) AS BIGINT) AS n_per_arm
        |FROM d ORDER BY event_type""".stripMargin,
    // rolling 7-day p95 via additive histograms: each day's bin
    // counts explode into the trailing windows they serve, ceil-rank
    // + in-bin interpolation per (type, day) — integer ranks, one
    // float division
    // rolling 7-day p95 via additive histograms: each day's bin
    // counts explode into the trailing windows they serve, ceil-rank
    // + in-bin interpolation per (type, day) — integer ranks, one
    // float division
    "events_rolling_p95" ->
      """WITH ev AS (SELECT event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d,
        |        CAST(round(value * 100) AS BIGINT) AS cents
        |      FROM events WHERE value IS NOT NULL),
        |bx AS (SELECT max(d) AS hi FROM ev),
        |db AS (SELECT event_type, d, cents // 800 AS bin,
        |        CAST(count(*) AS BIGINT) AS cnt
        |      FROM ev GROUP BY 1, 2, 3),
        |co AS (SELECT db.event_type, db.bin, db.d + o.o AS td, db.cnt
        |       FROM db CROSS JOIN (SELECT unnest(range(7)) AS o) o),
        |wc AS (SELECT event_type, td, bin, CAST(sum(cnt) AS BIGINT)
        |         AS wcnt
        |       FROM co, bx WHERE td <= bx.hi GROUP BY 1, 2, 3),
        |cm AS (SELECT event_type, td, bin, wcnt,
        |        CAST(sum(wcnt) OVER (PARTITION BY event_type, td
        |          ORDER BY bin) AS BIGINT) AS cum,
        |        CAST(sum(wcnt) OVER (PARTITION BY event_type, td)
        |          AS BIGINT) AS n
        |      FROM wc),
        |es AS (SELECT *, (19 * n + 19) // 20 AS t FROM cm),
        |sel AS (SELECT event_type, td, n, bin, wcnt, cum, t,
        |         row_number() OVER (PARTITION BY event_type, td
        |           ORDER BY bin) AS rn
        |       FROM es WHERE cum >= t)
        |SELECT event_type, CAST(td AS BIGINT) AS day, n,
        |  round((800.0 * bin + 800.0 * (t - (cum - wcnt)) / wcnt)
        |    / 100.0, 4) AS p95_value
        |FROM sel WHERE rn = 1 ORDER BY event_type, day""".stripMargin,
    // time-to-convert per funnel transition: integer-second stage
    // gaps from the funnel's own per-user timestamps; exact mean
    // (one division of exact sums), quantile_cont p50/p95, max
    // time-to-convert per funnel transition: integer-second stage
    // gaps from the funnel's own per-user timestamps; exact mean
    // (one division of exact sums), quantile_cont p50/p95, max
    "events_funnel_timing" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        |      GROUP BY 1),
        |g AS (SELECT 'view_to_click' AS transition,
        |        CAST(floor(epoch(c.c_ts)) AS BIGINT)
        |          - CAST(floor(epoch(v.v_ts)) AS BIGINT) AS gap_s
        |      FROM c JOIN v ON c.user_id = v.user_id
        |      UNION ALL
        |      SELECT 'click_to_purchase',
        |        CAST(floor(epoch(p.p_ts)) AS BIGINT)
        |          - CAST(floor(epoch(c.c_ts)) AS BIGINT)
        |      FROM p JOIN c ON p.user_id = c.user_id)
        |SELECT transition, CAST(count(*) AS BIGINT) AS n_users,
        |  round(sum(gap_s) * 1.0 / count(*), 4) AS mean_gap_s,
        |  round(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s,
        |  round(quantile_cont(gap_s, 0.95), 4) AS p95_gap_s,
        |  CAST(max(gap_s) AS BIGINT) AS max_gap_s
        |FROM g GROUP BY 1 ORDER BY transition""".stripMargin,
    // ordered-sequence pattern (view → click → purchase, each stage
    // within 86400s of its predecessor): running RANGE-window maxima
    // mirror the Spark formulation stage for stage; timestamp
    // comparisons are exact (interval arithmetic, no epoch
    // truncation), and RANGE frames keep same-ts ties order-blind
    // ordered-sequence pattern (view → click → purchase, each stage
    // within 86400s of its predecessor): running RANGE-window maxima
    // mirror the Spark formulation stage for stage; timestamp
    // comparisons are exact (interval arithmetic, no epoch
    // truncation), and RANGE frames keep same-ts ties order-blind
    "events_pattern_match" ->
      """WITH ev AS (SELECT user_id, event_type, ts FROM events
        |            WHERE event_type IN ('view', 'click', 'purchase')),
        |m AS (SELECT user_id, event_type, ts,
        |        max(CASE WHEN event_type = 'view' THEN ts END)
        |          OVER (PARTITION BY user_id ORDER BY ts
        |                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS v_run
        |      FROM ev),
        |c AS (SELECT user_id, event_type, ts,
        |        max(CASE WHEN event_type = 'click' AND v_run IS NOT NULL
        |              AND ts <= v_run + INTERVAL 86400 SECOND THEN ts END)
        |          OVER (PARTITION BY user_id ORDER BY ts
        |                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS c_run
        |      FROM m),
        |h AS (SELECT user_id, ts,
        |        (event_type = 'purchase' AND c_run IS NOT NULL
        |         AND ts <= c_run + INTERVAL 86400 SECOND) AS hit
        |      FROM c)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_matches,
        |       min(CASE WHEN hit THEN ts END) AS first_match_ts,
        |       max(CASE WHEN hit THEN ts END) AS last_match_ts
        |FROM h GROUP BY 1
        |HAVING sum(CASE WHEN hit THEN 1 ELSE 0 END) > 0
        |ORDER BY user_id""".stripMargin,
    // Welch z on 2dp values via exact integer micro sums: mean,
    // variance, and z evaluate identical doubles from identical
    // BIGINTs on both engines (z is scale-invariant — micro units
    // throughout, no /100 to disagree on)
    // sequential peeking curve: cumulative Welch z per day on exact
    // integer running moments, constant 2.797 boundary
    // Welch z on 2dp values via exact integer micro sums: mean,
    // variance, and z evaluate identical doubles from identical
    // BIGINTs on both engines (z is scale-invariant — micro units
    // throughout, no /100 to disagree on)
    // sequential peeking curve: cumulative Welch z per day on exact
    // integer running moments, constant 2.797 boundary
    "events_ab_sequential" ->
      """WITH e AS (SELECT user_id % 2 AS variant,
        |             CAST(ts AS DATE) - DATE '1970-01-01' AS d,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events),
        |g AS (SELECT variant, d, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(micro) AS BIGINT) AS sx,
        |        CAST(sum(micro * micro) AS BIGINT) AS qx
        |      FROM e GROUP BY 1, 2),
        |days AS (SELECT DISTINCT d FROM e),
        |vs AS (SELECT unnest(range(0, 2)) AS variant),
        |z AS (SELECT vs.variant, days.d,
        |        coalesce(g.n, 0) AS n, coalesce(g.sx, 0) AS sx,
        |        coalesce(g.qx, 0) AS qx
        |      FROM days CROSS JOIN vs
        |      LEFT JOIN g ON g.variant = vs.variant AND g.d = days.d),
        |c AS (SELECT variant, d,
        |        CAST(sum(n) OVER pw AS BIGINT) AS cn,
        |        CAST(sum(sx) OVER pw AS BIGINT) AS cs,
        |        CAST(sum(qx) OVER pw AS BIGINT) AS cq
        |      FROM z WINDOW pw AS (PARTITION BY variant ORDER BY d
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |j AS (SELECT a.d, a.cn AS n_a, b.cn AS n_b,
        |        (CAST(a.cs AS DOUBLE) / a.cn - CAST(b.cs AS DOUBLE) / b.cn)
        |          / sqrt(CAST(a.cn * a.cq - a.cs * a.cs AS DOUBLE)
        |              / CAST(a.cn * (a.cn - 1) AS DOUBLE) / a.cn
        |            + CAST(b.cn * b.cq - b.cs * b.cs AS DOUBLE)
        |              / CAST(b.cn * (b.cn - 1) AS DOUBLE) / b.cn) AS z
        |      FROM c a JOIN c b ON a.d = b.d
        |        AND a.variant = 0 AND b.variant = 1
        |      WHERE a.cn > 1 AND b.cn > 1)
        |SELECT CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS VARCHAR)
        |         AS day,
        |       n_a, n_b, round(z, 4) AS z,
        |       CAST(CASE WHEN abs(z) >= 2.797 THEN 1 ELSE 0 END
        |         AS BIGINT) AS signif
        |FROM j ORDER BY day""".stripMargin,
    "events_ab_test" ->
      """WITH m AS (SELECT event_type, user_id % 2 AS variant,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events),
        |g AS (SELECT event_type, variant, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(micro) AS BIGINT) AS sx,
        |        CAST(sum(micro * micro) AS BIGINT) AS qx
        |      FROM m GROUP BY 1, 2),
        |a AS (SELECT event_type, n AS n_a, sx AS s_a, qx AS q_a
        |      FROM g WHERE variant = 0),
        |b AS (SELECT event_type, n AS n_b, sx AS s_b, qx AS q_b
        |      FROM g WHERE variant = 1)
        |SELECT a.event_type, n_a, n_b,
        |       round(s_a * 1.0 / n_a / 100.0, 4) AS mean_a,
        |       round(s_b * 1.0 / n_b / 100.0, 4) AS mean_b,
        |       round((s_a * 1.0 / n_a - s_b * 1.0 / n_b)
        |         / sqrt(((n_a * q_a - s_a * s_a) * 1.0
        |                  / (n_a * (n_a - 1))) / n_a
        |              + ((n_b * q_b - s_b * s_b) * 1.0
        |                  / (n_b * (n_b - 1))) / n_b), 4) AS z
        |FROM a JOIN b USING (event_type)
        |WHERE n_a > 1 AND n_b > 1
        |ORDER BY event_type""".stripMargin,
    // revenue bridge: part-grain vol = r0·Δq/q0 micro-cents via
    // truncating div, price+mix = exact remainder; brand rollups are
    // integer sums
    // order-1 vs order-2 Markov: same calendar split, accuracy ON
    // covered contexts + coverage reported separately
    "events_next_pred2" ->
      """WITH ev AS (SELECT user_id, event_id, ts, event_type,
        |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |               AS d
        |           FROM events),
        |b AS (SELECT (min(d) + max(d)) // 2 AS mid FROM ev),
        |tg AS (SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN d < mid THEN 'train' ELSE 'eval' END AS split
        |       FROM ev CROSS JOIN b),
        |lg AS (SELECT split, event_type,
        |         lag(event_type, 1) OVER w AS p1,
        |         lag(event_type, 2) OVER w AS p2
        |       FROM tg
        |       WINDOW w AS (PARTITION BY user_id, split
        |         ORDER BY ts, event_id)),
        |r1 AS (SELECT split, p1, event_type FROM lg
        |       WHERE p1 IS NOT NULL),
        |t1 AS (SELECT p1, event_type, CAST(count(*) AS BIGINT) AS cnt
        |       FROM r1 WHERE split = 'train' GROUP BY 1, 2),
        |m1 AS (SELECT p1, event_type AS pred FROM
        |        (SELECT *, row_number() OVER (PARTITION BY p1
        |           ORDER BY cnt DESC, event_type) AS rn FROM t1)
        |       WHERE rn = 1),
        |e1 AS (SELECT p1, event_type FROM r1 WHERE split = 'eval'),
        |s1 AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM m1)
        |           AS n_contexts,
        |         (SELECT CAST(count(*) AS BIGINT) FROM e1)
        |           AS n_eval_total,
        |         CAST(count(*) AS BIGINT) AS n_covered,
        |         CAST(sum(CASE WHEN e1.event_type = m1.pred
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |       FROM e1 JOIN m1 USING (p1)),
        |r2 AS (SELECT split, p2, p1, event_type FROM lg
        |       WHERE p1 IS NOT NULL AND p2 IS NOT NULL),
        |t2 AS (SELECT p2, p1, event_type, CAST(count(*) AS BIGINT)
        |           AS cnt
        |       FROM r2 WHERE split = 'train' GROUP BY 1, 2, 3),
        |m2 AS (SELECT p2, p1, event_type AS pred FROM
        |        (SELECT *, row_number() OVER (PARTITION BY p2, p1
        |           ORDER BY cnt DESC, event_type) AS rn FROM t2)
        |       WHERE rn = 1),
        |e2 AS (SELECT p2, p1, event_type FROM r2 WHERE split = 'eval'),
        |s2 AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM m2)
        |           AS n_contexts,
        |         (SELECT CAST(count(*) AS BIGINT) FROM e2)
        |           AS n_eval_total,
        |         CAST(count(*) AS BIGINT) AS n_covered,
        |         CAST(sum(CASE WHEN e2.event_type = m2.pred
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |       FROM e2 JOIN m2 USING (p2, p1))
        |SELECT model_order, n_contexts, n_eval_total, n_covered,
        |       n_correct,
        |       round(CAST(n_correct AS DOUBLE) / n_covered, 4)
        |         AS acc_on_covered,
        |       round(CAST(n_covered AS DOUBLE) / n_eval_total, 4)
        |         AS coverage
        |FROM (SELECT CAST(1 AS BIGINT) AS model_order, * FROM s1
        |      UNION ALL SELECT CAST(2 AS BIGINT), * FROM s2)
        |ORDER BY model_order""".stripMargin,
    // STL-lite: micro-int trend via div 7 (both engines truncate
    // toward zero), integer seasonal/resid, decimal squared sums
    // STL-lite: micro-int trend via div 7 (both engines truncate
    // toward zero), integer seasonal/resid, decimal squared sums
    "events_stl_decompose" ->
      """WITH ev AS (SELECT event_type,
        |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |               AS d
        |           FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |meta AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |tys AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, g.d
        |         FROM tys t CROSS JOIN
        |           (SELECT unnest(range(lo, hi + 1)) AS d FROM meta) g),
        |dense AS (SELECT grid.event_type, grid.d,
        |            coalesce(daily.n, 0) AS n
        |          FROM grid LEFT JOIN daily USING (event_type, d)),
        |ww AS (SELECT event_type, d, n,
        |         count(*) OVER w AS c7,
        |         CAST(sum(n) OVER w AS BIGINT) AS s7
        |       FROM dense
        |       WINDOW w AS (PARTITION BY event_type ORDER BY d
        |         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |inter AS (SELECT event_type, d, n,
        |            n * 1000000 - ((s7 * 1000000) // 7) AS detr,
        |            d % 7 AS dow
        |          FROM ww WHERE c7 = 7),
        |seas AS (SELECT event_type, dow,
        |           CAST(sum(detr) // count(*) AS BIGINT) AS sdow
        |         FROM inter GROUP BY 1, 2),
        |parts AS (SELECT i.event_type, i.n, i.detr - s.sdow AS resid,
        |            s.sdow
        |          FROM inter i JOIN seas s
        |            ON i.event_type = s.event_type AND i.dow = s.dow),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(n * 1000000) AS BIGINT) AS sx,
        |         sum(CAST(resid AS HUGEINT) * CAST(resid AS HUGEINT))
        |           AS sr2,
        |         CAST(max(sdow) AS BIGINT) AS smax,
        |         CAST(min(sdow) AS BIGINT) AS smin
        |       FROM parts GROUP BY 1),
        |ce AS (SELECT p.event_type,
        |         sum(CAST(p.n * 1000000 - (st.sx // st.n_days) AS HUGEINT)
        |           * CAST(p.n * 1000000 - (st.sx // st.n_days)
        |             AS HUGEINT)) AS sc2
        |       FROM parts p JOIN st USING (event_type)
        |       GROUP BY 1)
        |SELECT st.event_type, st.n_days,
        |       round(CAST(st.smax - st.smin AS DOUBLE) / 1e6, 4)
        |         AS seasonal_amplitude,
        |       CASE WHEN ce.sc2 > 0
        |         THEN round(CAST(st.sr2 AS DOUBLE) / CAST(ce.sc2 AS DOUBLE),
        |           4)
        |         ELSE NULL END AS resid_var_share
        |FROM st JOIN ce USING (event_type)
        |WHERE st.n_days > 7
        |ORDER BY st.event_type""".stripMargin,
    // winsorized mean: ceil-rank order-statistic bounds off the value
    // histogram (integer clip, exact sums)
    // winsorized mean: ceil-rank order-statistic bounds off the value
    // histogram (integer clip, exact sums)
    "events_winsorized" ->
      """WITH m AS (SELECT event_type,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, micro, CAST(count(*) AS BIGINT) AS c
        |      FROM m GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
        |      FROM h GROUP BY 1),
        |cu AS (SELECT h.event_type, h.micro, t.n,
        |         sum(h.c) OVER (PARTITION BY h.event_type ORDER BY h.micro
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS cum
        |       FROM h JOIN t USING (event_type)),
        |b AS (SELECT event_type,
        |        min(CASE WHEN cum >= (n * 5 + 99) // 100
        |          THEN micro END) AS lo,
        |        min(CASE WHEN cum >= (n * 95 + 99) // 100
        |          THEN micro END) AS hi
        |      FROM cu GROUP BY 1),
        |cl AS (SELECT m.event_type, m.micro, b.lo, b.hi,
        |         least(greatest(m.micro, b.lo), b.hi) AS clip
        |       FROM m JOIN b USING (event_type))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(max(lo) AS DOUBLE) / 100.0, 4) AS p05,
        |       round(CAST(max(hi) AS DOUBLE) / 100.0, 4) AS p95,
        |       round(CAST(sum(micro) AS DOUBLE) / count(*) / 100.0, 4)
        |         AS mean_raw,
        |       round(CAST(sum(clip) AS DOUBLE) / count(*) / 100.0, 4)
        |         AS mean_winsorized
        |FROM cl GROUP BY 1 ORDER BY event_type""".stripMargin,
    // A/A null test: arm-A users re-split by an independent md5 coin
    // A/A null test: arm-A users re-split by an independent md5 coin
    "events_aa_test" ->
      """WITH m AS (SELECT event_type,
        |             CAST('0x' || substr(md5('aa|' ||
        |               CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
        |               AS variant,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events WHERE user_id % 2 = 0),
        |g AS (SELECT event_type, variant, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(micro) AS BIGINT) AS sx,
        |        CAST(sum(micro * micro) AS BIGINT) AS qx
        |      FROM m GROUP BY 1, 2),
        |a AS (SELECT event_type, n AS n_a, sx AS s_a, qx AS q_a
        |      FROM g WHERE variant = 0),
        |b AS (SELECT event_type, n AS n_b, sx AS s_b, qx AS q_b
        |      FROM g WHERE variant = 1),
        |zc AS (SELECT a.event_type, n_a, n_b,
        |         (s_a * 1.0 / n_a - s_b * 1.0 / n_b)
        |           / sqrt((CAST(CAST(n_a AS HUGEINT) * q_a
        |                 - CAST(s_a AS HUGEINT) * s_a AS DOUBLE)
        |               / (n_a * (n_a - 1))) / n_a
        |             + (CAST(CAST(n_b AS HUGEINT) * q_b
        |                 - CAST(s_b AS HUGEINT) * s_b AS DOUBLE)
        |               / (n_b * (n_b - 1))) / n_b) AS z
        |       FROM a JOIN b USING (event_type)
        |       WHERE n_a > 1 AND n_b > 1)
        |SELECT event_type, n_a, n_b, round(z, 4) AS z,
        |       (abs(z) > 1.96) AS sig
        |FROM zc ORDER BY event_type""".stripMargin,
    // SRM guardrail: two-cell equal-prob chi2 on distinct users/arm
    // SRM guardrail: two-cell equal-prob chi2 on distinct users/arm
    "events_ab_srm" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id,
        |             user_id % 2 AS variant
        |           FROM events),
        |g AS (SELECT event_type,
        |        CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_a,
        |        CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_b
        |      FROM u GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        |       round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |         / (n_a + n_b), 4) AS chi2,
        |       (CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |         / (n_a + n_b) > 3.841) AS srm
        |FROM g ORDER BY event_type""".stripMargin,
    // DiD 2x2: cell means from integer micro sums, midpoint from data
    // DiD 2x2: cell means from integer micro sums, midpoint from data
    "events_did" ->
      """WITH m AS (SELECT event_type, user_id % 2 AS treat,
        |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |               AS d,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events),
        |b AS (SELECT (min(d) + max(d)) // 2 AS mid FROM m),
        |g AS (SELECT event_type,
        |        CAST(sum(CASE WHEN treat = 1 AND d < mid
        |          THEN micro ELSE 0 END) AS BIGINT) AS s_pre_t,
        |        CAST(sum(CASE WHEN treat = 1 AND d < mid
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_t,
        |        CAST(sum(CASE WHEN treat = 1 AND d >= mid
        |          THEN micro ELSE 0 END) AS BIGINT) AS s_post_t,
        |        CAST(sum(CASE WHEN treat = 1 AND d >= mid
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_post_t,
        |        CAST(sum(CASE WHEN treat = 0 AND d < mid
        |          THEN micro ELSE 0 END) AS BIGINT) AS s_pre_c,
        |        CAST(sum(CASE WHEN treat = 0 AND d < mid
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_c,
        |        CAST(sum(CASE WHEN treat = 0 AND d >= mid
        |          THEN micro ELSE 0 END) AS BIGINT) AS s_post_c,
        |        CAST(sum(CASE WHEN treat = 0 AND d >= mid
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_post_c
        |      FROM m CROSS JOIN b GROUP BY 1)
        |SELECT event_type,
        |       round(s_pre_t * 1.0 / n_pre_t / 100.0, 4) AS pre_t,
        |       round(s_post_t * 1.0 / n_post_t / 100.0, 4) AS post_t,
        |       round(s_pre_c * 1.0 / n_pre_c / 100.0, 4) AS pre_c,
        |       round(s_post_c * 1.0 / n_post_c / 100.0, 4) AS post_c,
        |       round((s_post_t * 1.0 / n_post_t / 100.0
        |           - s_pre_t * 1.0 / n_pre_t / 100.0)
        |         - (s_post_c * 1.0 / n_post_c / 100.0
        |           - s_pre_c * 1.0 / n_pre_c / 100.0), 4) AS did
        |FROM g
        |WHERE n_pre_t > 0 AND n_post_t > 0 AND n_pre_c > 0
        |  AND n_post_c > 0
        |ORDER BY event_type""".stripMargin,
    // win-back: gap over the (user, day) distinct set, month rollup
    // win-back: gap over the (user, day) distinct set, month rollup
    "events_reactivation" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |g AS (SELECT user_id, d,
        |        d - lag(d) OVER (PARTITION BY user_id ORDER BY d)
        |          AS gap
        |      FROM ud),
        |m AS (SELECT user_id, d // 30 AS mon,
        |        (gap IS NOT NULL AND gap > 60) AS rea
        |      FROM g)
        |SELECT mon, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
        |       CAST(count(DISTINCT CASE WHEN rea THEN user_id END)
        |         AS BIGINT) AS n_reactivated,
        |       round(CAST(count(DISTINCT CASE WHEN rea THEN user_id END)
        |           AS DOUBLE)
        |         / count(DISTINCT user_id), 6) AS reactivation_rate
        |FROM m GROUP BY 1 ORDER BY mon""".stripMargin,
    // shingle df histogram: integer CASE cuts; the 2-8 band is the
    // containment path's blocking-key supply
    // per-day share HALF-UP micro-quantized, then integer-moment OLS
    "events_share_trend" ->
      """WITH daily AS (SELECT event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d,
        |        CAST(count(*) AS BIGINT) AS n
        |      FROM events GROUP BY 1, 2),
        |tot AS (SELECT d, CAST(sum(n) AS BIGINT) AS tot
        |        FROM daily GROUP BY 1),
        |sh AS (SELECT daily.event_type, daily.d,
        |         (2 * daily.n * 1000000 + tot.tot) // (2 * tot.tot)
        |           AS sh
        |       FROM daily JOIN tot ON daily.d = tot.d),
        |b AS (SELECT min(d) AS d0 FROM sh),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
        |         CAST(sum(d - b.d0) AS BIGINT) AS sx,
        |         CAST(sum(sh) AS BIGINT) AS sy,
        |         sum(CAST(d - b.d0 AS HUGEINT) * (d - b.d0)) AS sxx,
        |         sum(CAST(d - b.d0 AS HUGEINT) * sh) AS sxy
        |       FROM sh, b GROUP BY 1)
        |SELECT event_type, nd AS n_days,
        |       round(CAST(CAST(nd AS HUGEINT) * sxy
        |           - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |         / CAST(CAST(nd AS HUGEINT) * sxx
        |           - CAST(sx AS HUGEINT) * sx AS DOUBLE), 4)
        |         AS slope_ppm_per_day
        |FROM st WHERE nd > 1 ORDER BY event_type""".stripMargin,
    // quartiles exact interpolation on the 2dp micro grid; Tukey
    // fences; outlier count one integer-vs-fence comparison per row
    // quartiles exact interpolation on the 2dp micro grid; Tukey
    // fences; outlier count one integer-vs-fence comparison per row
    "events_value_boxplot" ->
      """WITH ev AS (SELECT event_type,
        |              CAST(round(value * 100) AS BIGINT) AS micro
        |            FROM events),
        |q AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        quantile_cont(micro, 0.25) AS q1,
        |        quantile_cont(micro, 0.5) AS q2,
        |        quantile_cont(micro, 0.75) AS q3
        |      FROM ev GROUP BY 1),
        |f AS (SELECT event_type, n, q1, q2, q3, q3 - q1 AS iqr,
        |        q1 - 1.5 * (q3 - q1) AS lo_fence,
        |        q3 + 1.5 * (q3 - q1) AS hi_fence
        |      FROM q),
        |o AS (SELECT ev.event_type, CAST(count(*) AS BIGINT)
        |          AS n_outliers
        |      FROM ev JOIN f ON ev.event_type = f.event_type
        |      WHERE ev.micro < f.lo_fence OR ev.micro > f.hi_fence
        |      GROUP BY 1)
        |SELECT f.event_type, f.n,
        |       round(f.q1 / 100.0, 4) AS q1,
        |       round(f.q2 / 100.0, 4) AS median,
        |       round(f.q3 / 100.0, 4) AS q3,
        |       round(f.iqr / 100.0, 4) AS iqr,
        |       coalesce(o.n_outliers, 0) AS n_outliers
        |FROM f LEFT JOIN o ON f.event_type = o.event_type
        |ORDER BY f.event_type""".stripMargin,
    // Beta(20,80) pseudo-count shrinkage: one exact-integer division
    // rolling distinct actives: each (user, day) covers window-ends
    // [day, min(day+W-1, next-1)] (clipped at the user's next
    // activity so overlaps never double-count); rolling distinct =
    // covering-interval count via the ±1 sweep
    "events_rolling_active" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |iv AS (SELECT user_id, d,
        |         lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nxt
        |       FROM ud),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
        |cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS d FROM b),
        |w7 AS (SELECT t, CAST(sum(delta) AS BIGINT) AS dd FROM (
        |         SELECT d AS t, 1 AS delta FROM iv
        |         UNION ALL
        |         SELECT least(d + 6, coalesce(nxt - 1, d + 6)) + 1, -1
        |         FROM iv) GROUP BY 1),
        |w30 AS (SELECT t, CAST(sum(delta) AS BIGINT) AS dd FROM (
        |          SELECT d AS t, 1 AS delta FROM iv
        |          UNION ALL
        |          SELECT least(d + 29, coalesce(nxt - 1, d + 29)) + 1, -1
        |          FROM iv) GROUP BY 1),
        |r7 AS (SELECT cal.d, CAST(sum(coalesce(w7.dd, 0))
        |         OVER (ORDER BY cal.d ROWS UNBOUNDED PRECEDING)
        |         AS BIGINT) AS wau7
        |       FROM cal LEFT JOIN w7 ON cal.d = w7.t),
        |r30 AS (SELECT cal.d, CAST(sum(coalesce(w30.dd, 0))
        |          OVER (ORDER BY cal.d ROWS UNBOUNDED PRECEDING)
        |          AS BIGINT) AS mau30
        |        FROM cal LEFT JOIN w30 ON cal.d = w30.t),
        |da AS (SELECT d, CAST(count(*) AS BIGINT) AS dau
        |       FROM ud GROUP BY 1)
        |SELECT CAST(DATE '1970-01-01' + CAST(cal.d AS INTEGER)
        |         AS VARCHAR) AS day,
        |       coalesce(da.dau, 0) AS dau, r7.wau7, r30.mau30,
        |       CASE WHEN r30.mau30 > 0
        |            THEN round(CAST(coalesce(da.dau, 0) AS DOUBLE)
        |              / r30.mau30, 4) END AS stickiness
        |FROM cal LEFT JOIN da ON cal.d = da.d
        |JOIN r7 ON cal.d = r7.d JOIN r30 ON cal.d = r30.d
        |ORDER BY day""".stripMargin,
    // first-order Markov next-event baseline: transitions learned on
    // the first calendar half, graded on pairs wholly inside the
    // second (lag partitioned by (user, split) — no straddling pair)
    // first-order Markov next-event baseline: transitions learned on
    // the first calendar half, graded on pairs wholly inside the
    // second (lag partitioned by (user, split) — no straddling pair)
    "events_next_pred" ->
      """WITH ev AS (SELECT user_id, event_id, ts, event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |bn AS (SELECT (min(d) + max(d)) // 2 AS mid FROM ev),
        |tg AS (SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN d < bn.mid THEN 'train' ELSE 'eval' END
        |           AS split
        |       FROM ev, bn),
        |p AS (SELECT split, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id, split
        |          ORDER BY ts, event_id) AS prev
        |      FROM tg),
        |pr AS (SELECT split, prev, event_type FROM p
        |       WHERE prev IS NOT NULL),
        |tr AS (SELECT prev, event_type, CAST(count(*) AS BIGINT) AS cnt
        |       FROM pr WHERE split = 'train' GROUP BY 1, 2),
        |md AS (SELECT prev, event_type AS predicted_next, cnt FROM (
        |         SELECT prev, event_type, cnt,
        |           row_number() OVER (PARTITION BY prev
        |             ORDER BY cnt DESC, event_type) AS rn
        |         FROM tr) WHERE rn = 1),
        |nt AS (SELECT prev, CAST(sum(cnt) AS BIGINT) AS n_train
        |       FROM tr GROUP BY 1),
        |ea AS (SELECT pr.prev, CAST(count(*) AS BIGINT) AS n_eval,
        |         CAST(sum(CASE WHEN pr.event_type = md.predicted_next
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |       FROM pr JOIN md ON pr.prev = md.prev
        |       WHERE pr.split = 'eval' GROUP BY 1)
        |SELECT md.prev, nt.n_train, md.predicted_next,
        |       ea.n_eval, ea.n_correct,
        |       round(CAST(ea.n_correct AS DOUBLE) / ea.n_eval, 4)
        |         AS accuracy
        |FROM md JOIN nt ON md.prev = nt.prev
        |JOIN ea ON md.prev = ea.prev
        |ORDER BY md.prev""".stripMargin,
    // truncated Holt: the per-day window fold unrolls as a recursive
    // CTE stepping through the ≤14-element window list; micro-unit
    // integer recursion with truncating // ≡ Spark div ≡ Scala Long./
    // truncated Holt: the per-day window fold unrolls as a recursive
    // CTE stepping through the ≤14-element window list; micro-unit
    // integer recursion with truncating // ≡ Spark div ≡ Scala Long./
    "events_forecast_holt" ->
      s"""WITH RECURSIVE $holtCtes
         |SELECT event_type,
         |       CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS VARCHAR)
         |         AS day,
         |       round(CAST(l AS DOUBLE) / 1000000.0, 6) AS level,
         |       round(CAST(b AS DOUBLE) / 1000000.0, 6) AS trend,
         |       round(CAST(l + b AS DOUBLE) / 1000000.0, 6) AS forecast1
         |FROM f ORDER BY event_type, day""".stripMargin,
    // head-to-head backtest over the SAME Holt chain: one-step-ahead
    // = previous day's l+b (lag), naive = n seven days back; errors
    // exact micro-unit integers, winner an integer comparison
    // head-to-head backtest over the SAME Holt chain: one-step-ahead
    // = previous day's l+b (lag), naive = n seven days back; errors
    // exact micro-unit integers, winner an integer comparison
    "events_forecast_eval" ->
      s"""WITH RECURSIVE $holtCtes,
         |g AS (SELECT f.event_type, f.d, dense.n, f.l + f.b AS fc
         |      FROM f JOIN dense ON f.event_type = dense.event_type
         |                       AND f.d = dense.d),
         |h AS (SELECT event_type, d, n,
         |        lag(fc) OVER (PARTITION BY event_type ORDER BY d)
         |          AS holt_pred,
         |        lag(n, 7) OVER (PARTITION BY event_type ORDER BY d)
         |          AS naive_pred
         |      FROM g),
         |e AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         |        CAST(sum(abs(n * 1000000 - holt_pred)) AS BIGINT)
         |          AS holt_err,
         |        CAST(sum(abs(n - naive_pred) * 1000000) AS BIGINT)
         |          AS naive_err,
         |        CAST(sum(n * 1000000) AS BIGINT) AS actual
         |      FROM h
         |      WHERE holt_pred IS NOT NULL AND naive_pred IS NOT NULL
         |      GROUP BY 1)
         |SELECT event_type, n_days,
         |       round(CAST(naive_err AS DOUBLE) / actual, 6)
         |         AS wape_naive,
         |       round(CAST(holt_err AS DOUBLE) / actual, 6)
         |         AS wape_holt,
         |       CASE WHEN holt_err < naive_err THEN 'holt'
         |            WHEN holt_err > naive_err THEN 'naive'
         |            ELSE 'tie' END AS winner
         |FROM e WHERE actual > 0 ORDER BY event_type""".stripMargin,
    // boundary sweep over sessionized intervals (+1 start, -1 end+1);
    // the oracle affords the single global running sum the Spark
    // plan decomposes through day bands
    // boundary sweep over sessionized intervals (+1 start, -1 end+1);
    // the oracle affords the single global running sum the Spark
    // plan decomposes through day bands
    "events_peak_concurrency" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR CAST(floor(epoch(ts)) AS BIGINT)
        |                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
        |                  > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |           AS session_id
        |  FROM x),
        |sess AS (SELECT user_id, session_id,
        |           min(CAST(floor(epoch(ts)) AS BIGINT)) AS st,
        |           max(CAST(floor(epoch(ts)) AS BIGINT)) AS en
        |         FROM y GROUP BY 1, 2),
        |bounds AS (SELECT st AS t, 1 AS delta FROM sess
        |           UNION ALL SELECT en + 1, -1 FROM sess),
        |byt AS (SELECT t, CAST(sum(delta) AS BIGINT) AS d,
        |          CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS starts
        |        FROM bounds GROUP BY 1),
        |run AS (SELECT t, starts,
        |          sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |            AS c
        |        FROM byt)
        |SELECT t // 86400 AS day_n, CAST(sum(starts) AS BIGINT)
        |         AS n_starts,
        |       CAST(max(c) AS BIGINT) AS peak_concurrent
        |FROM run GROUP BY 1 ORDER BY day_n""".stripMargin,
    // Fano factor over the same dense grid: exact integer moments
    // (squares in HUGEINT ≡ DECIMAL(38,0)), all-double k-row tail
    // Fano factor over the same dense grid: exact integer moments
    // (squares in HUGEINT ≡ DECIMAL(38,0)), all-double k-row tail
    "events_fano" ->
      """WITH ev AS (SELECT event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS d FROM b),
        |tys AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT tys.event_type, cal.d FROM tys CROSS JOIN cal),
        |s AS (SELECT g.event_type, g.d, coalesce(daily.n, 0) AS n
        |      FROM grid g LEFT JOIN daily
        |        ON g.event_type = daily.event_type AND g.d = daily.d),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |        CAST(sum(n) AS BIGINT) AS s1,
        |        sum(CAST(n AS HUGEINT) * n) AS s2
        |      FROM s GROUP BY 1)
        |SELECT event_type, n_days,
        |       round(CAST(s1 AS DOUBLE) / n_days, 4) AS mean_daily,
        |       round((CAST(CAST(n_days AS HUGEINT) * s2
        |           - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
        |         / (CAST(n_days AS DOUBLE)
        |           * (CAST(n_days AS DOUBLE) - 1.0)))
        |         / (CAST(s1 AS DOUBLE) / n_days), 4) AS fano
        |FROM g WHERE n_days > 1 AND s1 > 0
        |ORDER BY event_type""".stripMargin,
    // Page–Hinkley replay: running mean HALF-UP quantized to exact
    // micro-units via (2·cum·10⁶ + t) // (2·t), so U / prefix-min /
    // PH / alarms are all integer comparisons on both engines
    // Page–Hinkley replay: running mean HALF-UP quantized to exact
    // micro-units via (2·cum·10⁶ + t) // (2·t), so U / prefix-min /
    // PH / alarms are all integer comparisons on both engines
    "events_page_hinkley" ->
      """WITH ev AS (SELECT event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS d FROM b),
        |tys AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT tys.event_type, cal.d FROM tys CROSS JOIN cal),
        |s AS (SELECT g.event_type, g.d, coalesce(daily.n, 0) AS n
        |      FROM grid g LEFT JOIN daily
        |        ON g.event_type = daily.event_type AND g.d = daily.d),
        |w AS (SELECT event_type, d, n,
        |        row_number() OVER (PARTITION BY event_type ORDER BY d)
        |          AS t,
        |        sum(n) OVER (PARTITION BY event_type ORDER BY d
        |          ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM s),
        |x AS (SELECT event_type, d,
        |        n * 1000000 - ((2 * cum * 1000000 + t) // (2 * t))
        |          - 2000000 AS dev
        |      FROM w),
        |y AS (SELECT event_type, d,
        |        sum(dev) OVER (PARTITION BY event_type ORDER BY d
        |          ROWS UNBOUNDED PRECEDING) AS u
        |      FROM x),
        |z AS (SELECT event_type, d, u,
        |        min(u) OVER (PARTITION BY event_type ORDER BY d
        |          ROWS UNBOUNDED PRECEDING) AS minu
        |      FROM y)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |       round(CAST(max(u - minu) AS DOUBLE) / 1000000.0, 4)
        |         AS max_ph,
        |       CAST(sum(CASE WHEN u - minu > 50000000 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_alarms,
        |       CAST(min(CASE WHEN u - minu > 50000000 THEN d END)
        |         AS BIGINT) AS first_alarm_d
        |FROM z GROUP BY 1 ORDER BY event_type""".stripMargin,
    // rank-sum from the value HISTOGRAM: tie-averaged doubled rank
    // 2·cum−ct+1 is an exact integer; HUGEINT ≡ Spark DECIMAL(38,0)
    // for the doubled rank-sum + tie correction; z all-double tail
    // rank-sum from the value HISTOGRAM: tie-averaged doubled rank
    // 2·cum−ct+1 is an exact integer; HUGEINT ≡ Spark DECIMAL(38,0)
    // for the doubled rank-sum + tie correction; z all-double tail
    "events_mann_whitney" ->
      """WITH m AS (SELECT event_type, user_id % 2 AS variant,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events WHERE value IS NOT NULL),
        |g AS (SELECT event_type, micro, CAST(count(*) AS BIGINT) AS ct,
        |        CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS ca
        |      FROM m GROUP BY 1, 2),
        |r AS (SELECT event_type, ct, ca,
        |        sum(ct) OVER (PARTITION BY event_type ORDER BY micro
        |                      ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM g),
        |s AS (SELECT event_type,
        |        sum(CAST(ca AS HUGEINT) * (2 * cum - ct + 1)) AS r1x2,
        |        CAST(sum(ca) AS BIGINT) AS n1,
        |        CAST(sum(ct) AS BIGINT) AS n,
        |        sum(CAST(ct AS HUGEINT) * ct * ct - ct) AS tiesum
        |      FROM r GROUP BY 1),
        |f AS (SELECT event_type, n1, n - n1 AS n2,
        |        CAST(r1x2 AS DOUBLE) / 2.0
        |          - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)
        |            / 2.0 AS u1,
        |        CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 12.0
        |          * (CAST(n AS DOUBLE) + 1.0
        |             - CAST(tiesum AS DOUBLE)
        |               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |          AS sigma2,
        |        CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 2.0 AS mu
        |      FROM s WHERE n1 > 0 AND n - n1 > 0)
        |SELECT event_type, n1 AS n_a, n2 AS n_b,
        |       round(u1, 1) AS u,
        |       round((u1 - mu) / sqrt(sigma2), 4) AS z
        |FROM f ORDER BY event_type""".stripMargin,
    // ECDF gap as exact integer cross-product |cumA·nB − cumB·nA|;
    // one division on the fold; scaled stat uses √/÷ only (no libm)
    // ECDF gap as exact integer cross-product |cumA·nB − cumB·nA|;
    // one division on the fold; scaled stat uses √/÷ only (no libm)
    "events_ks_test" ->
      """WITH m AS (SELECT event_type, user_id % 2 AS variant,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events WHERE value IS NOT NULL),
        |g AS (SELECT event_type, micro,
        |        CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS ca,
        |        CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS cb
        |      FROM m GROUP BY 1, 2),
        |c AS (SELECT event_type,
        |        sum(ca) OVER (PARTITION BY event_type ORDER BY micro
        |                      ROWS UNBOUNDED PRECEDING) AS cum_a,
        |        sum(cb) OVER (PARTITION BY event_type ORDER BY micro
        |                      ROWS UNBOUNDED PRECEDING) AS cum_b
        |      FROM g),
        |t AS (SELECT event_type, cum_a, cum_b,
        |        max(cum_a) OVER (PARTITION BY event_type) AS na,
        |        max(cum_b) OVER (PARTITION BY event_type) AS nb
        |      FROM c),
        |s AS (SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
        |        CAST(max(nb) AS BIGINT) AS n_b,
        |        max(abs(CAST(cum_a AS HUGEINT) * nb
        |                - CAST(cum_b AS HUGEINT) * na)) AS dnum
        |      FROM t GROUP BY 1),
        |f AS (SELECT event_type, n_a, n_b,
        |        CAST(dnum AS DOUBLE)
        |          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d
        |      FROM s WHERE n_a > 0 AND n_b > 0)
        |SELECT event_type, n_a, n_b, round(d, 6) AS ks_d,
        |       round(d * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |         / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))), 4)
        |         AS ks_stat
        |FROM f ORDER BY event_type""".stripMargin,
    // power sums exact in HUGEINT ≡ DECIMAL(38,0); central-moment
    // assembly all-double on the k-row fold; m2^1.5 spelled m2·√m2
    // power sums exact in HUGEINT ≡ DECIMAL(38,0); central-moment
    // assembly all-double on the k-row fold; m2^1.5 spelled m2·√m2
    "events_moments" ->
      """WITH m AS (SELECT event_type,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(micro) AS BIGINT) AS s1,
        |        sum(CAST(micro AS HUGEINT) * micro) AS s2,
        |        sum(CAST(micro AS HUGEINT) * micro * micro) AS s3,
        |        sum(CAST(micro AS HUGEINT) * micro * micro * micro) AS s4
        |      FROM m GROUP BY 1),
        |f AS (SELECT event_type, n,
        |        CAST(s1 AS DOUBLE) / n AS mean,
        |        CAST(s2 AS DOUBLE) / n AS e2,
        |        CAST(s3 AS DOUBLE) / n AS e3,
        |        CAST(s4 AS DOUBLE) / n AS e4
        |      FROM g WHERE n > 1),
        |c AS (SELECT event_type, n, mean,
        |        e2 - mean * mean AS m2,
        |        e3 - 3.0 * mean * e2 + 2.0 * mean * mean * mean AS m3,
        |        e4 - 4.0 * mean * e3 + 6.0 * mean * mean * e2
        |          - 3.0 * mean * mean * mean * mean AS m4
        |      FROM f)
        |SELECT event_type, n, round(mean / 100.0, 4) AS mean_val,
        |       round(m3 / (m2 * sqrt(m2)), 4) AS skewness,
        |       round(m4 / (m2 * m2) - 3.0, 4) AS kurtosis
        |FROM c ORDER BY event_type""".stripMargin,
    // discrete KM hazard: span div 90 via floor division on both
    // engines (a double / + CAST would truncate vs round-half-even);
    // survival products deliberately not emitted (float fold order)
    // CUPED: θ from pooled exact moments; every reported statistic
    // closes over integer moments (Y_adj is affine in x, y — no
    // per-user float aggregate anywhere)
    "events_ab_cuped" -> {
      val theta = "(n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)"
      val vary = "(nv * vsyy - vsy * vsy) * 1.0 / (nv * (nv - 1))"
      val covv = "(nv * vsxy - vsx * vsy) * 1.0 / (nv * (nv - 1))"
      val varx = "(nv * vsxx - vsx * vsx) * 1.0 / (nv * (nv - 1))"
      s"""WITH ev AS (SELECT user_id,
         |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
         |          AS d,
         |        CAST(round(value * 100) AS BIGINT) AS micro
         |      FROM events),
         |bn AS (SELECT (min(d) + max(d)) // 2 AS mid FROM ev),
         |per AS (SELECT user_id,
         |        sum(CASE WHEN d < bn.mid THEN micro ELSE 0 END) AS x,
         |        sum(CASE WHEN d >= bn.mid THEN micro ELSE 0 END) AS y,
         |        user_id % 2 AS variant
         |      FROM ev, bn GROUP BY user_id, bn.mid),
         |p AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
         |        sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
         |      FROM per),
         |v AS (SELECT variant, CAST(count(*) AS BIGINT) AS nv,
         |        sum(x) AS vsx, sum(y) AS vsy, sum(x * y) AS vsxy,
         |        sum(x * x) AS vsxx, sum(y * y) AS vsyy
         |      FROM per GROUP BY 1)
         |SELECT CAST(variant AS BIGINT) AS variant, nv AS n_users,
         |  round($theta, 6) AS theta,
         |  round(vsy * 1.0 / nv / 100.0, 4) AS mean_y,
         |  round((vsy * 1.0 / nv - ($theta) *
         |    (vsx * 1.0 / nv - sx * 1.0 / n)) / 100.0, 4) AS mean_y_adj,
         |  round((($vary) - 2 * ($theta) * ($covv) +
         |    ($theta) * ($theta) * ($varx)) / ($vary), 4)
         |    AS var_ratio
         |FROM v, p WHERE nv >= 2 AND ($vary) > 0
         |ORDER BY variant""".stripMargin
    },
    // degree assortativity: exact integer moments over the symmetric
    // mutual edge list, degrees bounded by k
    // event-type co-occurrence PMI over user-day incidence: pairs
    // expand only within a user-day; marginals and the total are
    // aggregate-sized
    "events_cooccurrence" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
        |              event_type
        |            FROM events),
        |tot AS (SELECT count(*) AS n_days FROM
        |          (SELECT DISTINCT user_id, day FROM ud)),
        |mg AS (SELECT event_type, count(*) AS n_type FROM ud GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |        count(*) AS n_both
        |      FROM ud a JOIN ud b ON a.user_id = b.user_id
        |        AND a.day = b.day AND a.event_type < b.event_type
        |      GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
        |       round(log2(p.n_both * 1.0 * t.n_days
        |         / (ma.n_type * 1.0 * mb.n_type)), 4) AS pmi
        |FROM p JOIN mg ma ON p.type_a = ma.event_type
        |JOIN mg mb ON p.type_b = mb.event_type
        |CROSS JOIN tot t ORDER BY type_a, type_b""".stripMargin,
    // 2-D Pareto frontier: the NOT EXISTS dominance definition — the
    // Spark side's banded order-statistics formulation must agree
    // with the quadratic ground truth exactly
    // one-way ANOVA F: per-type s²/n micro-quantized to BIGINT
    // before the cross-type sum (order-free), 1-row scalar fold
    "events_anova" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(m) AS BIGINT) AS sx,
        |             CAST(sum(m * m) AS BIGINT) AS q
        |           FROM (SELECT event_type,
        |                   CAST(round(value * 100) AS BIGINT) AS m
        |                 FROM events) GROUP BY 1),
        |p AS (SELECT n, sx, q,
        |        (CAST(sx AS HUGEINT) * sx * 2000 + n) // (2 * n) AS rq
        |      FROM g),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |        CAST(sum(n) AS BIGINT) AS nn,
        |        CAST(sum(sx) AS BIGINT) AS ss,
        |        CAST(sum(q) AS BIGINT) AS qq,
        |        sum(rq) AS srq
        |      FROM p)
        |SELECT k AS n_groups, nn AS n_obs,
        |       round(((CAST(srq AS DOUBLE) / 1000.0
        |           - CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE) / nn)
        |           / (k - 1))
        |         / ((CAST(qq AS DOUBLE) - CAST(srq AS DOUBLE) / 1000.0)
        |           / (nn - k)), 4) AS f_stat
        |FROM a WHERE k > 1 AND nn > k""".stripMargin,
    // second capstone: cleaned corpus → md5 split → per-split volumes
    // + residual cross-split contamination (the decontam formulation
    // over the CLEANED corpus); CTE names suffixed A to avoid the
    // shared victims chain's names
    // gap fill: dense type×calendar grid built FROM the data bounds
    // (unnest(range(lo, hi+1)) — an expression, so column args are
    // fine where generate_series's table function rejects laterals;
    // a fixed literal window would silently truncate if the driver
    // regenerated events outside it), zero-filled counts, 7-day
    // trailing mean
    // over the FILLED series (≤7-int sum/count — exact both engines)
    // per-user feature table on the dense calendar: all-integer
    // lag/rolling/recency features
    "events_user_features" ->
      """WITH e AS (SELECT user_id,
        |             CAST(ts AS DATE) - DATE '1970-01-01' AS d
        |           FROM events),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
        |cal AS (SELECT unnest(range(lo, hi + 1)) AS d FROM b),
        |us AS (SELECT DISTINCT user_id FROM e),
        |daily AS (SELECT user_id, d, CAST(count(*) AS BIGINT) AS n
        |          FROM e GROUP BY 1, 2),
        |g AS (SELECT us.user_id, cal.d, coalesce(daily.n, 0) AS n
        |      FROM us CROSS JOIN cal
        |      LEFT JOIN daily ON daily.user_id = us.user_id
        |                     AND daily.d = cal.d),
        |f AS (SELECT user_id, d, n,
        |        coalesce(lag(n, 1) OVER pw, 0) AS lag1,
        |        sum(n) OVER (PARTITION BY user_id ORDER BY d
        |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll7,
        |        max(CASE WHEN n > 0 THEN d END) OVER
        |          (PARTITION BY user_id ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS la
        |      FROM g WINDOW pw AS (PARTITION BY user_id ORDER BY d))
        |SELECT user_id,
        |       CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS VARCHAR)
        |         AS day,
        |       CAST(n AS BIGINT) AS n, CAST(lag1 AS BIGINT) AS lag1,
        |       CAST(roll7 AS BIGINT) AS roll7,
        |       CAST(coalesce(d - la, -1) AS BIGINT) AS days_since_active
        |FROM f ORDER BY user_id, day""".stripMargin,
    "events_gap_fill" ->
      """WITH ev AS (SELECT event_type,
        |              CAST(ts AS DATE) - DATE '1970-01-01' AS d, value
        |            FROM events),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |cal AS (SELECT unnest(range(lo, hi + 1)) AS d FROM b),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev WHERE value > 300 GROUP BY 1, 2),
        |dense AS (SELECT ty.event_type, cal.d,
        |            coalesce(daily.n, 0) AS n
        |          FROM ty CROSS JOIN cal
        |          LEFT JOIN daily ON daily.event_type = ty.event_type
        |                         AND daily.d = cal.d)
        |SELECT event_type,
        |       CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS VARCHAR)
        |         AS day,
        |       n,
        |       round(avg(n) OVER (PARTITION BY event_type ORDER BY d
        |                          ROWS BETWEEN 6 PRECEDING
        |                          AND CURRENT ROW), 4) AS ma7
        |FROM dense ORDER BY event_type, day""".stripMargin,
    // pivot mirror: explicit-value conditional aggregation
    // pivot mirror: explicit-value conditional aggregation
    "events_pivot" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    // truncated EWMA (α=1/2, 14-day) as a banded self-join on the
    // dense grid; power-of-two weights keep num/den exact BIGINTs
    // truncated EWMA (α=1/2, 14-day) as a banded self-join on the
    // dense grid; power-of-two weights keep num/den exact BIGINTs
    "events_ewma" ->
      """WITH ev AS (SELECT event_type,
        |              CAST(ts AS DATE) - DATE '1970-01-01' AS d
        |            FROM events),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |cal AS (SELECT unnest(range(lo, hi + 1)) AS d FROM b),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |dense AS (SELECT ty.event_type, cal.d,
        |            coalesce(daily.n, 0) AS n
        |          FROM ty CROSS JOIN cal
        |          LEFT JOIN daily ON daily.event_type = ty.event_type
        |                         AND daily.d = cal.d),
        |w AS (SELECT a.event_type, a.d,
        |        CAST(sum(r.n * (1::BIGINT
        |          << CAST(13 - (a.d - r.d) AS INTEGER))) AS BIGINT) AS num,
        |        CAST(sum(1::BIGINT
        |          << CAST(13 - (a.d - r.d) AS INTEGER)) AS BIGINT) AS den
        |      FROM dense a JOIN dense r ON a.event_type = r.event_type
        |        AND r.d BETWEEN a.d - 13 AND a.d
        |      GROUP BY 1, 2)
        |SELECT event_type,
        |       CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS VARCHAR)
        |         AS day,
        |       round(num * 1.0 / den, 4) AS ewma
        |FROM w ORDER BY event_type, day""".stripMargin,
    "events_rollup_cube" ->
      """WITH e AS (SELECT event_type,
        |             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |             value
        |           FROM events)
        |SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(day, 'ALL') AS day,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sv
        |FROM e GROUP BY ROLLUP(event_type, day)
        |ORDER BY event_type, day""".stripMargin,
    // weekly cohort retention: Monday-truncated weeks on both engines,
    // weeks_since is exact integer day arithmetic
    "events_retention" ->
      """WITH f AS (SELECT user_id,
        |             CAST(date_trunc('week', min(ts)) AS DATE)
        |               AS cohort_week
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id,
        |             CAST(date_trunc('week', ts) AS DATE) AS week
        |      FROM events),
        |g AS (SELECT f.cohort_week,
        |             CAST(date_diff('day', f.cohort_week, a.week) // 7
        |               AS BIGINT) AS weeks_since,
        |             CAST(count(*) AS BIGINT) AS n_users
        |      FROM f JOIN a ON f.user_id = a.user_id
        |      GROUP BY 1, 2),
        |cs AS (SELECT cohort_week, n_users AS cohort_n
        |       FROM g WHERE weeks_since = 0)
        |SELECT g.cohort_week, g.weeks_since, g.n_users,
        |       round(CAST(g.n_users AS DOUBLE) / cs.cohort_n, 4)
        |         AS retention
        |FROM g JOIN cs ON g.cohort_week = cs.cohort_week
        |ORDER BY g.cohort_week, g.weeks_since""".stripMargin,
    // hour-of-week heatmap: ISO dow both engines (Spark weekday+1)
    "events_heatmap" ->
      """WITH ev AS (SELECT isodow(ts) AS dow,
        |             CAST(hour(ts) AS BIGINT) AS hour FROM events),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM ev)
        |SELECT CAST(dow AS BIGINT) AS dow, hour,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(count(*) / t.nt, 6) AS share
        |FROM ev, t GROUP BY 1, 2, t.nt
        |ORDER BY dow, hour""".stripMargin,
    // quantization-ladder fidelity: per-row cosine(v, recon) in 4dp
    // integer micro-units (fold-order-proof), reconstructions from
    // the same trained constants each codec's search mirror uses
    // DAU/WAU stickiness: Monday-truncated weeks (the retention
    // discipline), exact BIGINT counts, divisions only at the end
    "events_stickiness" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |              CAST(date_trunc('week', ts) AS DATE) AS week
        |            FROM events),
        |dau AS (SELECT week, day, CAST(count(*) AS BIGINT) AS dau
        |        FROM (SELECT DISTINCT user_id, day, week FROM ev)
        |        GROUP BY 1, 2),
        |wk AS (SELECT week, CAST(count(*) AS BIGINT) AS wau
        |       FROM (SELECT DISTINCT user_id, week FROM ev)
        |       GROUP BY 1),
        |d AS (SELECT week, CAST(sum(dau) AS BIGINT) AS sum_dau,
        |             CAST(count(*) AS BIGINT) AS n_days
        |      FROM dau GROUP BY 1)
        |SELECT CAST(d.week AS VARCHAR) AS week, d.n_days, wk.wau,
        |       round(CAST(d.sum_dau AS DOUBLE) / d.n_days, 4) AS avg_dau,
        |       round(CAST(d.sum_dau AS DOUBLE) / (d.n_days * wk.wau), 4)
        |         AS stickiness
        |FROM d JOIN wk ON d.week = wk.week
        |ORDER BY week""".stripMargin,
    // z-order skip-scan: file selection is conservative (min/max box
    // intersection) and the exact predicate re-applies, so the result
    // is the plain filter — layout invariance is the contract
    // (ZOrderSpec pins the actual pruning)
    "events_zorder_skip" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(sum(value), 4) AS sum_value
        |FROM events
        |WHERE user_id BETWEEN 40 AND 79
        |  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-09' AND DATE '2024-01-16'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_salted_enrich" ->
      """WITH ua AS (SELECT user_id, avg(value) AS user_avg
        |            FROM events GROUP BY user_id)
        |SELECT e.user_id, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN e.value > ua.user_avg THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_above
        |FROM events e JOIN ua USING (user_id)
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,
    // hopping windows: every event lands in the two 12h-aligned
    // 1-day windows covering it (epoch-aligned, like Spark's window())
    // hopping windows: every event lands in the two 12h-aligned
    // 1-day windows covering it (epoch-aligned, like Spark's window())
    "events_hopping" ->
      """WITH w AS (SELECT event_type, value,
        |    unnest([to_timestamp((epoch_us(ts) // 43200000000) * 43200),
        |            to_timestamp((epoch_us(ts) // 43200000000) * 43200
        |                         - 43200)]) AS ws
        |  FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4)
        |         AS sum_value
        |FROM w GROUP BY ws, event_type ORDER BY w_start, event_type""".stripMargin,
    // robust MAD anomaly twin: exact interpolated medians over the
    // daily frame, 1.4826 shared double literal, MAD=0 types excluded
    // robust MAD anomaly twin: exact interpolated medians over the
    // daily frame, 1.4826 shared double literal, MAD=0 types excluded
    "events_anomaly_mad" ->
      """WITH daily AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
        |        FROM daily GROUP BY 1),
        |wm AS (SELECT d.event_type, d.day, d.n, m.med
        |       FROM daily d JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(abs(n - med), 0.5)
        |          AS mad
        |        FROM wm GROUP BY 1),
        |rz AS (SELECT wm.event_type, wm.day, wm.n, wm.med, mad.mad,
        |        round((wm.n - wm.med)
        |          / (CAST(1.4826 AS DOUBLE) * mad.mad), 4) AS robust_z
        |       FROM wm JOIN mad USING (event_type) WHERE mad.mad > 0)
        |SELECT event_type, day, n, round(med, 4) AS med,
        |  round(mad, 4) AS mad, robust_z
        |FROM rz WHERE abs(robust_z) >= 2.5
        |ORDER BY event_type, day""".stripMargin,
    "events_anomaly" ->
      """WITH daily AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, day, n,
        |         sum(n) OVER (PARTITION BY event_type) AS s1,
        |         sum(n*n) OVER (PARTITION BY event_type) AS s2,
        |         count(*) OVER (PARTITION BY event_type) AS nd
        |       FROM daily),
        |zs AS (SELECT event_type, day, n,
        |         round((n - s1 * 1.0 / nd)
        |           / sqrt(s2 * 1.0 / nd
        |                  - (s1 * 1.0 / nd) * (s1 * 1.0 / nd)), 4) AS zscore
        |       FROM st
        |       WHERE s2 * 1.0 / nd
        |             - (s1 * 1.0 / nd) * (s1 * 1.0 / nd) > 0)
        |SELECT event_type, day, n, zscore FROM zs
        |WHERE abs(zscore) >= 2.0 ORDER BY event_type, day""".stripMargin,
    "events_anomaly_online" ->
      """WITH daily AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, day, n,
        |         sum(n) OVER w AS s1, sum(n*n) OVER w AS s2,
        |         count(*) OVER w AS nd
        |       FROM daily
        |       WINDOW w AS (PARTITION BY event_type ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |zs AS (SELECT event_type, day, n,
        |         round((n - s1 * 1.0 / nd)
        |           / sqrt(s2 * 1.0 / nd
        |                  - (s1 * 1.0 / nd) * (s1 * 1.0 / nd)), 4) AS zscore
        |       FROM st WHERE nd >= 7 AND nd * s2 > s1 * s1)
        |SELECT event_type, day, n, zscore FROM zs
        |WHERE abs(zscore) >= 2.0 ORDER BY event_type, day""".stripMargin,
    // changepoint: the argmax runs on the EXACT integer split score
    // |nd·cum − t·tot| (HUGEINT in DuckDB, BIGINT in Spark — cast
    // down before output); the two means are exact-integer divisions
    // changepoint: the argmax runs on the EXACT integer split score
    // |nd·cum − t·tot| (HUGEINT in DuckDB, BIGINT in Spark — cast
    // down before output); the two means are exact-integer divisions
    "events_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, n,
        |        row_number() OVER (PARTITION BY event_type ORDER BY day)
        |          AS t,
        |        sum(n) OVER (PARTITION BY event_type ORDER BY day
        |          ROWS UNBOUNDED PRECEDING) AS cum,
        |        count(*) OVER (PARTITION BY event_type) AS nd,
        |        sum(n) OVER (PARTITION BY event_type) AS tot
        |      FROM daily),
        |d AS (SELECT *, abs(nd*cum - t*tot) AS score FROM w WHERE t < nd),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY score DESC, day) AS rk
        |      FROM d)
        |SELECT event_type, day AS split_day,
        |       CAST(t AS BIGINT) AS days_before,
        |       CAST(nd - t AS BIGINT) AS days_after,
        |       CAST(score AS BIGINT) AS score,
        |       round(cum * 1.0 / t, 4) AS mean_before,
        |       round((tot - cum) * 1.0 / (nd - t), 4) AS mean_after
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,
    // maintained daily rollup: the oracle is the one-shot rebuild
    // (micro-unit longs keep the maintained == rebuilt fold exact)
    "events_daily_agg" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS d, event_type,
        |             CAST(round(value * 1000000, 0) AS BIGINT) AS mv
        |           FROM events)
        |SELECT CAST(d AS VARCHAR) AS day, event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(sum(mv) AS DOUBLE) / 1000000, 4) AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "events_tumbling" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "events_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR CAST(floor(epoch(ts)) AS BIGINT)
        |                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM x)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM y GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    // the banded range join must equal the naive inequality join —
    // DuckDB plans it as IEJoin; the session CTEs mirror
    // events_sessionize's
    // the banded range join must equal the naive inequality join —
    // DuckDB plans it as IEJoin; the session CTEs mirror
    // events_sessionize's
    "events_session_attr" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR CAST(floor(epoch(ts)) AS BIGINT)
        |                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM x),
        |sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |         min(ts) AS s_start, max(ts) AS s_end
        |  FROM y GROUP BY user_id, session_id),
        |p AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ets,
        |       s.session_id,
        |       strftime(s.s_start, '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(s.s_end, '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM p JOIN sess s
        |  ON p.user_id = s.user_id
        | AND p.ts >= s.s_start AND p.ts <= s.s_end
        |ORDER BY event_id""".stripMargin,
    // DuckDB has a native ASOF JOIN with exactly the >= pick-latest
    // semantics AsOf.asofJoin implements via the union-tag window.
    // Timestamps compare at µs on both engines: Spark truncates the
    // parquet ns to timestamp_micros, the cast to DuckDB TIMESTAMP
    // (µs) truncates identically.
    // DuckDB has a native ASOF JOIN with exactly the >= pick-latest
    // semantics AsOf.asofJoin implements via the union-tag window.
    // Timestamps compare at µs on both engines: Spark truncates the
    // parquet ns to timestamp_micros, the cast to DuckDB TIMESTAMP
    // (µs) truncates identically.
    "events_asof_join" ->
      """WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts,
        |                  max(value) AS click_value
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts, value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |       strftime(p.pts, '%Y-%m-%d %H:%M:%S') AS ets,
        |       round(p.value, 4) AS pvalue,
        |       strftime(c.cts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |       round(c.click_value, 4) AS click_value
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.pts >= c.cts
        |ORDER BY event_id""".stripMargin,
  )
}
