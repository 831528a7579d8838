package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over the event stream — the
  * MATCH_RECOGNIZE-shaped pattern detection and co-occurrence
  * statistics a product-analytics engine layers on the same scan the
  * funnel uses (reference scope: doc/scalar.md's "scalar data"
  * companion store; the reference itself has no sequence engine, so
  * these are the beyond-reference pipeline operators the brief
  * calls for).
  */
object Sequence {

  /** Max gap between consecutive pattern stages, seconds. 24h: the
    * driver's synthetic per-user event spacing is hours, so an
    * hour-scale gap matches nothing at any SF — a day-scale gap
    * yields a non-trivial match set at sf0.001 through sf0.1.
    */
  val GapSeconds = 86400L

  /** PATTERN MATCH: per user, count completions of the strictly
    * ordered sequence view → click → purchase where each stage
    * follows its predecessor within [[GapSeconds]].
    *
    * Stage qualification is expressed with running RANGE windows over
    * the per-user timeline — the same scan-free formulation as
    * [[Analytics.eventsFunnel]], extended with the gap constraint:
    * `v_run` is the latest view at-or-before each row; a click
    * qualifies iff `v_run` is within the gap; `c_run` is the latest
    * QUALIFYING click at-or-before each row; a purchase matches iff
    * `c_run` is within the gap. RANGE frames make same-timestamp ties
    * order-blind (a click sees a same-ts view — both sides of the
    * oracle agree on this tie rule), and the whole operator is one
    * events scan plus one user_id-keyed exchange shared by both
    * windows and the final aggregate — the shape that survives a
    * 1000-executor shuffle because per-user state never leaves its
    * partition.
    */
  def patternMatch(s: SparkSession, dir: String): DataFrame =
    patternMatchOn(Tables.events(s, dir), GapSeconds)

  /** Composable form over any (user_id, event_type, ts) frame. */
  def patternMatchOn(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val isView = col("event_type") === "view"
    val isClick = col("event_type") === "click"
    val isPurchase = col("event_type") === "purchase"
    // exact timestamp-interval comparison (micros included) — an
    // epoch-seconds subtraction would truncate differently here and
    // in the mirror
    val gapOk = (a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column) =>
      b.isNotNull && a <= b + expr(s"INTERVAL $gapSeconds SECONDS")
    val matched = events
      .where(col("event_type").isin("view", "click", "purchase"))
      .select("user_id", "event_type", "ts")
      .withColumn("v_run", max(when(isView, col("ts"))).over(w))
      .withColumn("c_run", max(when(
        isClick && gapOk(col("ts"), col("v_run")), col("ts"))).over(w))
      .withColumn("hit",
        isPurchase && gapOk(col("ts"), col("c_run")))
    matched.groupBy("user_id")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_matches"),
        min(when(col("hit"), col("ts"))).as("first_match_ts"),
        max(when(col("hit"), col("ts"))).as("last_match_ts"))
      .where(col("n_matches") > 0)
      .orderBy("user_id")
  }

  /** CO-OCCURRENCE PMI: which event-type pairs show up together in
    * the same user-day more often than independence predicts —
    * pointwise mutual information over user-day incidence.
    *
    * The unit of co-occurrence is the distinct (user_id, day,
    * event_type) triple; pairs expand ONLY within a user-day group
    * (≤T types per group, so the expansion is corpus×T², never
    * corpus²), and the marginals (per-type day counts and the total
    * day count) are aggregate-sized — they broadcast onto the pair
    * counts. One events scan feeds all three aggregates.
    */
  def cooccurrence(s: SparkSession, dir: String,
                   minPairDays: Long = 5L): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"))
      .distinct()
    val total = ud.select("user_id", "day").distinct()
      .agg(count(lit(1)).as("n_days"))
    val marg = ud.groupBy("event_type")
      .agg(count(lit(1)).as("n_type"))
    val pairs = ud.as("a")
      .join(ud.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.day") === col("b.day") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .where(col("n_both") >= minPairDays)
    pairs
      .join(broadcast(marg.select(col("event_type").as("type_a"),
        col("n_type").as("n_a"))), "type_a")
      .join(broadcast(marg.select(col("event_type").as("type_b"),
        col("n_type").as("n_b"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_both"),
        round(log2(col("n_both").cast("double") * col("n_days")
          / (col("n_a").cast("double") * col("n_b"))), 4).as("pmi"))
      .orderBy("type_a", "type_b")
  }

  /** PARETO FRONTIER (skyline) over part: the parts no other part
    * beats on BOTH price (lower is better) and size (higher is
    * better). A part is dominated iff some part has price ≤ its
    * price AND size ≥ its size with at least one strict.
    *
    * The naive formulation is an all-pairs anti-join — O(N²) and a
    * cartesian at scale. The 2-D skyline collapses to order
    * statistics instead: group rows by exact price (within a price
    * group only the max-size rows can survive — anything smaller is
    * dominated by its own group), then a row survives iff its size
    * strictly exceeds the best size at ANY strictly lower price.
    * "Best size among cheaper" is a running max — computed with the
    * same value-banded two-level pattern as the exact deciles
    * (TextOps.qualityDeciles) and the export prefix sums: per-band
    * in-band running max over distinct prices + an exclusive prefix
    * max over the (band count)-sized per-band aggregate. No global
    * single-partition window, no pair expansion; cost is one
    * groupBy(price) plus banded windows — the shape that holds at
    * 100× data.
    */
  def partPareto(s: SparkSession, dir: String, bands: Int = 32): DataFrame =
    paretoOn(Tables.part(s, dir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size")), bands)

  /** Composable form over any (p_partkey, p_retailprice, p_size). */
  def paretoOn(parts0: DataFrame, bands: Int): DataFrame = {
    val parts = parts0
    // price-group max: only (price, grp_max) candidates can survive
    val grp = parts.groupBy("p_retailprice")
      .agg(max("p_size").as("grp_max"))
      .localCheckpoint(true)
    // driver-side planning state: 2 doubles (same discipline as the
    // deciles' band bases — bounded, never data-sized)
    val Array(lo, hi) = grp
      .agg(min("p_retailprice"), max("p_retailprice"))
      .collect()(0) match {
      case r => Array(r.getDouble(0), r.getDouble(1))
    }
    val width = math.max((hi - lo) / bands, 1e-9)
    val banded = grp.withColumn("band",
      least(floor((col("p_retailprice") - lit(lo)) / lit(width)),
        lit(bands - 1L)))
    // in-band running max over strictly cheaper DISTINCT prices
    // (rows here are one-per-price, so rowsBetween(..., -1) is
    // exactly "strictly cheaper within the band")
    val wIn = Window.partitionBy("band").orderBy("p_retailprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = banded.withColumn("in_band_max",
      max("grp_max").over(wIn))
    // exclusive prefix max over the per-band maxima — `bands` rows,
    // so the unpartitioned window is bounded planning state
    val wBand = Window.orderBy("band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = banded.groupBy("band").agg(max("grp_max").as("band_max"))
      .withColumn("prev_band_max", max("band_max").over(wBand))
      .select("band", "prev_band_max")
    val survivors = within.join(broadcast(prefix), "band")
      .withColumn("cheaper_max",
        greatest(coalesce(col("in_band_max"), lit(Int.MinValue)),
          coalesce(col("prev_band_max"), lit(Int.MinValue))))
      .where(col("grp_max") > col("cheaper_max"))
      .select(col("p_retailprice").as("sv_price"),
        col("grp_max").as("sv_size"))
    // survivors joined back: every row AT the surviving (price,
    // grp_max) point is non-dominated (ties are mutual non-dominance)
    parts.join(survivors,
        col("p_retailprice") === col("sv_price") &&
          col("p_size") === col("sv_size"))
      .select(col("p_partkey"), col("p_retailprice"),
        col("p_size").cast("long").as("p_size"))
      .orderBy("p_retailprice", "p_partkey")
  }

  /** BOT / AUTOMATION SCORE — inter-event-gap regularity per user:
    * humans arrive with bursty, high-variance gaps; schedulers and
    * scripted clients tick with machine-regular ones, so the
    * coefficient of variation of a user's gap sequence
    * (std/mean — scale-free, a 10 s bot and a 1 h cron both score
    * low) is the standard first-pass automation flag. Gaps are
    * INTEGER SECONDS between consecutive events ((ts, event_id)
    * order — the tiebreak makes equal-timestamp runs
    * deterministic), and the variance evaluates from the exact
    * integer moments (n, Σg, Σg²) — the events_ab_test rule, so no
    * float sum ever depends on aggregation order. One user_id
    * exchange (the scan's own), one window, one aggregate.
    */
  def botScore(s: SparkSession, dir: String,
               cvFlag: Double = 0.5): DataFrame = {
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("gap", lead(col("sec"), 1).over(
        Window.partitionBy("user_id").orderBy("sec", "event_id"))
        - col("sec"))
      .where(col("gap").isNotNull)
    val m = gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("sg"),
        sum(col("gap") * col("gap")).as("sg2"))
      .where(col("n_gaps") >= 2)
    val mean = col("sg").cast("double") / col("n_gaps")
    val variance = (col("sg2").cast("double") * col("n_gaps") -
      col("sg").cast("double") * col("sg")) /
      (col("n_gaps").cast("double") * (col("n_gaps") - 1))
    // an all-zero-gap user (every event on one timestamp) has
    // mean 0 — define cv as 0 there instead of 0/0
    val cv = when(col("sg") > 0, sqrt(variance) / mean).otherwise(lit(0.0))
    m.select(col("user_id"), col("n_gaps"),
        round(mean, 2).as("mean_gap_s"),
        round(cv, 4).as("cv_gap"),
        (round(cv, 4) < cvFlag).as("is_regular"))
      .orderBy("user_id")
  }
}
