package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the driver's TPC-H-ish tables — the
  * "scalar data should live in a columnar store / pg" future the
  * reference's own docs sketch (doc/scalar.md), realized as Spark
  * plans. These are also the bench headliners: classic
  * aggregate/join/window shapes whose plans must keep pushdown,
  * broadcast, and partial aggregation at 100 TB.
  */
object Analytics {

  /** TPC-H Q1 shape: scan-heavy group-aggregate, fully map-side
    * partial-aggregated; the filter pushes to parquet.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3 shape: selective dim filter → fact join → top-N revenue.
    * Customer scales with SF (multi-GB at 100 TB), so no forced
    * broadcast hint — AQE picks broadcast when the filtered side fits
    * under autoBroadcastJoinThreshold and shuffle-hash otherwise.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
      .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select(
        col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: star join through region→nation with the
    * customer-nation = supplier-nation co-location constraint. Only
    * genuinely bounded dims (nation⋈region: ≤25 rows at any SF) carry
    * a broadcast hint; customer/supplier scale linearly with SF, so
    * AQE picks their strategy (broadcast at small SF, shuffle-hash at
    * cluster scale — a forced hint would OOM the driver at 100 TB).
    */
  def q5LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q4 shape: date-filtered orders EXISTS-semi-joined to a
    * lineitem predicate, counted by priority. left_semi keeps the
    * build side to matching keys only — the EXISTS never duplicates
    * or widens order rows, so the aggregate input stays order-sized.
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val returned = Tables.lineitem(s, dir)
      .where(col("l_returnflag") === "R")
      .select("l_orderkey")
    ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6 shape: pure filter + global aggregate; every predicate
    * reaches the parquet scan, no shuffle except the final 1-row
    * partial-merge.
    */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  /** TPC-H Q14 shape: promo revenue share — fact⋈part join feeding a
    * conditional aggregate ratio. Part scales with SF; no forced
    * broadcast (AQE decides), and only (p_partkey, p_type) survive
    * column pruning into the join.
    */
  def q14PromoEffect(s: SparkSession, dir: String): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .join(Tables.part(s, dir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(round(
        sum(when(col("p_type") === "PROMO", disc).otherwise(0.0)) * 100.0
          / sum(disc), 4).as("promo_revenue_pct"))
  }

  /** TPC-H Q10 shape: per-customer revenue from returned items —
    * 3-table join aggregated at customer grain, top 20. The aggregate
    * is keyed by the customer attributes (avoids a second join to
    * re-attach them post-agg).
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_returnflag") === "R")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_acctbal"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        round(first(col("c_acctbal")), 2).as("c_acctbal"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.
    * The per-side conjuncts (p_size, l_quantity ranges) stay in the
    * OR — Catalyst cannot split them to the scans — but the join
    * itself remains a plain partkey equi-join, so the filter runs
    * post-join on pruned columns.
    */
  def q19DiscountedRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(Tables.part(s, dir).select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 30)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 40)))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))

  /** TPC-H Q7 shape: bilateral trade volume between two nations by
    * ship year — the same bounded dimension joined in TWO ROLES
    * (supplier's nation and customer's nation), with the
    * either-direction pair predicate evaluated after both joins. Both
    * roles broadcast (nation is ≤25 rows at any SF).
    */
  def q7VolumeShipping(s: SparkSession, dir: String,
                       n1: String = "NATION_1",
                       n2: String = "NATION_2"): DataFrame = {
    val nations = Tables.nation(s, dir).select("n_nationkey", "n_name")
    val suppNation = Tables.supplier(s, dir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNation = Tables.customer(s, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .where((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Event FUNNEL: view → click → purchase, strictly ordered per
    * user — the staged temporal pattern behind product analytics.
    * Each stage is a user_id-keyed aggregate (first qualifying event
    * at or after the previous stage's time) feeding the next via an
    * equi-join, so all three passes reuse the loader's user_id
    * exchange; counts are integer-exact. Stage semantics: a user
    * counts at stage k iff stages 1..k occurred in order — the
    * counts are monotone non-increasing by construction.
    */
  def eventsFunnel(s: SparkSession, dir: String): DataFrame = {
    // ONE events scan. The stage-join formulation (min view ts →
    // clicks ≥ it → purchases ≥ that) re-evaluated the events lineage
    // per stage AND per union branch — six scans. Running RANGE
    // windows express the same semantics scan-free: a click qualifies
    // iff a view exists at-or-before it (v_run, the running first
    // view ts, is non-null ⟺ v_ts ≤ click ts, since the frame only
    // holds rows ≤ current ts — RANGE includes same-ts ties, matching
    // the join's >=), and a purchase qualifies iff a QUALIFYING click
    // precedes it. Both windows and the per-user aggregate satisfy
    // their distribution from the loader's user_id spread; ties need
    // no secondary sort key because RANGE frames are order-blind
    // within equal ts.
    val perUser = funnelPerUser(s, dir)
    perUser.agg(
        count("v_ts").as("n_view"), count("c_ts").as("n_click"),
        count("p_ts").as("n_purchase"))
      .select(explode(array(
        struct(lit(1L).as("stage"), lit("view").as("name"),
          col("n_view").as("users")),
        struct(lit(2L).as("stage"), lit("view_click").as("name"),
          col("n_click").as("users")),
        struct(lit(3L).as("stage"), lit("view_click_purchase").as("name"),
          col("n_purchase").as("users")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.name").as("name"),
        col("r.users").as("users"))
      // the stage-join form emits no row for an empty stage (its
      // groupBy sees no input); keep that contract
      .where(col("users") > 0)
      .orderBy("stage")
  }

  /** The funnel's per-user stage timestamps (v_ts, c_ts, p_ts) —
    * shared by [[eventsFunnel]] (stage counts) and
    * [[eventsFunnelTiming]] (time-to-convert), so the two reports
    * can never disagree about what converted.
    */
  private def funnelPerUser(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val isView = col("event_type") === "view"
    val isClick = col("event_type") === "click"
    val isPurchase = col("event_type") === "purchase"
    Tables.events(s, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select("user_id", "event_type", "ts")
      .withColumn("v_run", min(when(isView, col("ts"))).over(w))
      .withColumn("c_run",
        min(when(isClick && col("v_run").isNotNull, col("ts"))).over(w))
      .groupBy("user_id").agg(
        min(when(isView, col("ts"))).as("v_ts"),
        min(when(isClick && col("v_run").isNotNull, col("ts"))).as("c_ts"),
        min(when(isPurchase && col("c_run").isNotNull, col("ts"))).as("p_ts"))
  }

  /** FUNNEL × EXPERIMENT — the conversion-rate A/B readout per
    * funnel transition: did the treatment move view→click or
    * click→purchase? Stages come from the ONE shared
    * [[funnelPerUser]] scan (the funnel and its experiment readout
    * cannot disagree about what converted), cohorts are the
    * deterministic user_id-mod-2 split the other A/B surfaces use,
    * and the two-proportion z runs on pooled p̂ — every input an
    * exact integer, so rates and z are identical doubles on both
    * engines. Output is transition-sized.
    */
  def eventsFunnelAb(s: SparkSession, dir: String): DataFrame = {
    val pu = funnelPerUser(s, dir)
      .select((col("user_id") % 2).as("variant"),
        col("v_ts").isNotNull.as("hv"), col("c_ts").isNotNull.as("hc"),
        col("p_ts").isNotNull.as("hp"))
    val g = pu.groupBy("variant").agg(
      sum(when(col("hv"), 1L).otherwise(0L)).as("v"),
      sum(when(col("hc"), 1L).otherwise(0L)).as("c"),
      sum(when(col("hp"), 1L).otherwise(0L)).as("p"))
    val tr = g.select(col("variant"),
        lit("view_to_click").as("transition"),
        col("v").as("n"), col("c").as("conv"))
      .unionByName(g.select(col("variant"),
        lit("click_to_purchase").as("transition"),
        col("c").as("n"), col("p").as("conv")))
    val a = tr.where(col("variant") === 0).select(col("transition"),
      col("n").as("n_a"), col("conv").as("conv_a"))
    val b = tr.where(col("variant") === 1).select(col("transition"),
      col("n").as("n_b"), col("conv").as("conv_b"))
    val ph = ((col("conv_a") + col("conv_b")).cast("double")
      / (col("n_a") + col("n_b")))
    a.join(b, "transition")
      .select(col("transition"), col("n_a"), col("conv_a"),
        col("n_b"), col("conv_b"),
        round(col("conv_a").cast("double") / col("n_a"), 4).as("rate_a"),
        round(col("conv_b").cast("double") / col("n_b"), 4).as("rate_b"),
        // degenerate pooled rate (nobody / everybody converts) has
        // zero pooled variance — z is undefined; report 0 (both
        // engines' guard, not an engine-specific inf/nan)
        when(col("conv_a") + col("conv_b") > 0 &&
            col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
          round((col("conv_a").cast("double") / col("n_a")
            - col("conv_b").cast("double") / col("n_b"))
            / sqrt(ph * (lit(1.0) - ph)
              * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4))
          .otherwise(lit(0.0)).as("z"))
      .orderBy("transition")
  }

  /** MULTI-TOUCH ATTRIBUTION — credit each purchase to the touch
    * events (view/click/signup) of the same user in the 7 days
    * before it, under the two standard models at once: LAST-TOUCH
    * (the latest touch takes the whole conversion; ties broken by
    * event_id like every equal-timestamp run in this repo) and
    * LINEAR (each of the n touches gets 1/n). Purchases with no
    * preceding touch report as the 'direct' row. Scale shape: the
    * purchase↔touch pairing is a user_id-keyed join band-limited to
    * 7 days (per-user fan-out, never cross-user); the linear credit
    * sums are grouped by (type, n_touch) FIRST — all-integer
    * aggregation — so the only float reduction is over the bounded
    * set of distinct touch counts, not per pair.
    */
  def eventsAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"))
    val t = ev.where(col("event_type").isin("view", "click", "signup"))
      .select(col("event_id").as("t_id"), col("user_id"),
        col("ts").as("t_ts"), col("event_type").as("t_type"))
    val pt = p.join(t, Seq("user_id"))
      .where(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"))
      .select("p_id", "t_id", "t_ts", "t_type")
    val per = pt.groupBy("p_id")
      .agg(count(lit(1)).as("n_touch"),
        max_by(col("t_type"), struct(col("t_ts"), col("t_id")))
          .as("last_type"))
    val byN = pt.join(per.select("p_id", "n_touch"), "p_id")
      .groupBy(col("t_type"), col("n_touch"))
      .agg(count(lit(1)).as("c"))
    val linear = byN.groupBy(col("t_type").as("event_type"))
      .agg(sum("c").as("touches"),
        sum(col("c").cast("double") / col("n_touch")).as("lc"))
    val last = per.groupBy(col("last_type").as("event_type"))
      .agg(count(lit(1)).as("last_touch"))
    val direct = p.join(per.select("p_id"), Seq("p_id"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("direct").as("event_type"), lit(0L).as("touches"),
        col("n").as("last_touch"), col("n").cast("double").as("lc"))
    linear.join(last, Seq("event_type"), "full")
      .select(col("event_type"),
        coalesce(col("touches"), lit(0L)).as("touches"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        coalesce(col("lc"), lit(0.0)).as("lc"))
      .unionByName(direct)
      .select(col("event_type"), col("touches"), col("last_touch"),
        round(col("lc"), 4).as("linear_credit"))
      .orderBy("event_type")
  }

  /** FUNNEL TIMING — time-to-convert per transition (the question a
    * funnel count can't answer: users convert, but how fast?): for
    * each user the funnel's own stage timestamps give integer-second
    * gaps view→click and click→purchase; per transition n, mean
    * (one division of exact integer sums), exact p50/p95 (Spark's
    * exact `percentile`, quantile_cont-interpolation — the
    * corpus_stats idiom), and max. The gap frame is user-sized (one
    * row per converting user per transition), so the percentile's
    * per-group sort buffers users, never events; the heavy work is
    * the funnel's one events scan, reused via [[funnelPerUser]].
    */
  def eventsFunnelTiming(s: SparkSession, dir: String): DataFrame = {
    val pu = funnelPerUser(s, dir)
    val gaps = pu.where(col("c_ts").isNotNull)
      .select(lit("view_to_click").as("transition"),
        (unix_timestamp(col("c_ts")) - unix_timestamp(col("v_ts")))
          .as("gap_s"))
      .unionByName(pu.where(col("p_ts").isNotNull)
        .select(lit("click_to_purchase").as("transition"),
          (unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts")))
            .as("gap_s")))
    gaps.groupBy("transition")
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("gap_s")).cast("double") / count(lit(1)), 4)
          .as("mean_gap_s"),
        round(expr("percentile(gap_s, 0.5)"), 4).as("p50_gap_s"),
        round(expr("percentile(gap_s, 0.95)"), 4).as("p95_gap_s"),
        max(col("gap_s")).as("max_gap_s"))
      .orderBy("transition")
  }

  /** Multi-granularity aggregate via ROLLUP (grouping sets): per
    * (event_type, day), per event_type, and grand total in ONE pass —
    * Spark plans the Expand + a single keyed exchange with map-side
    * partial aggregation, so the three granularities cost one
    * shuffle, not three queries. NULL grouping slots are labeled
    * 'ALL' (neither source column is nullable, so the label is
    * unambiguous).
    */
  def eventsRollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day"), lit("ALL")).as("day"),
        col("n"), col("sv"))
      .orderBy("event_type", "day")

  /** TPC-H Q13 shape: count-of-counts distribution — customers LEFT
    * OUTER joined to orders so zero-order customers survive with
    * count 0 (count(o_orderkey) skips the null from the outer join),
    * then a second aggregate histograms the per-customer counts.
    * Two chained aggregations on different keys; the second one's
    * input is already customer-sized, so the heavy exchange happens
    * exactly once.
    */
  def q13OrderDistribution(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.customer(s, dir).select("c_custkey")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q18 shape: large-volume orders — a HAVING-filtered
    * aggregate (per-order quantity sum above a threshold) feeding a
    * join back to orders and customers. The aggregate runs FIRST and
    * its survivors are few, so the enrichment joins carry only the
    * qualifying keys (the classic aggregate-then-join ordering a
    * naive join-then-filter plan gets wrong at scale). l_quantity is
    * integer-valued, so the double sum and the > compare are exact.
    */
  def q18LargeOrders(s: SparkSession, dir: String,
                     minQty: Double = 300.0): DataFrame = {
    val big = Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .where(col("total_qty") > minQty)
    big.join(Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        round(col("total_qty"), 2).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q8 shape: national market share — the widest star in the
    * suite (lineitem⋈part⋈orders⋈customer⋈supplier⋈nation⋈region)
    * with nation in TWO ROLES: the customer's nation→region gates
    * the market (a pure existence test, so it runs as a left_semi —
    * the join never widens fact rows), while the supplier's nation
    * feeds the share numerator and must be carried. The share is a
    * conditional-aggregate ratio per order year (the Q14 ratio
    * pattern under a Q5-class join). Bounded dims (nation, region)
    * broadcast; part/customer/supplier scale with SF, so AQE picks
    * their side.
    */
  def q8MarketShare(s: SparkSession, dir: String,
                    partType: String = "ECONOMY",
                    marketRegion: String = "ASIA",
                    shareNation: String = "NATION_3"): DataFrame = {
    val nations = Tables.nation(s, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    val marketNations = nations
      .join(broadcast(Tables.region(s, dir)
        .where(col("r_name") === marketRegion)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val marketCust = Tables.customer(s, dir)
      .join(broadcast(marketNations),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppNation = Tables.supplier(s, dir)
      .join(broadcast(nations.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val typedParts = Tables.part(s, dir)
      .where(col("p_type") === partType).select("p_partkey")
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
      .join(typedParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(marketCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === shareNation, vol)
          .otherwise(lit(0.0))) / sum(vol), 4).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q21 shape (the driver schema carries no commit/receipt
    * dates, so "kept the order waiting" becomes "was the sole
    * supplier with a returned line"): fact-table self-SEMI-join
    * (other suppliers exist on the order) composed with a
    * self-ANTI-join (no other supplier's line was returned) — the
    * exists/not-exists pair that makes Q21 the hardest TPC-H plan
    * shape. Both sides are orderkey equi-joins with a residual
    * suppkey inequality, so they hash-partition on orderkey — no
    * nested-loop; the anti side's build input is pre-filtered to
    * returned lines only.
    */
  def q21SoleBlame(s: SparkSession, dir: String): DataFrame = {
    val l1 = Tables.lineitem(s, dir).where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_suppkey").distinct()
    val l2 = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val l3 = Tables.lineitem(s, dir).where(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    l1.join(l2, col("l_orderkey") === col("o2") &&
        col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("o3") &&
        col("l_suppkey") =!= col("s3"), "left_anti")
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** TPC-H Q22 shape: above-average-balance customers with no RECENT
    * order (every fixture customer has SOME order, so the lapse
    * cutoff is what the anti-join bites on — closer to Q22's
    * "likely-lapsed customer" intent anyway) — a scalar aggregate
    * feeding a filter plus an ANTI-join against date-filtered orders,
    * aggregated per segment. The scalar is a 1-row broadcast
    * crossJoin (not a driver-collected literal, so the whole thing
    * stays ONE lazy plan); the threshold is rounded to 4dp on both
    * engines so the comparison is ulp-stable under distributed
    * summation order. The date predicate on the anti side reaches its
    * scan (PushedFilters), shrinking the anti build input.
    */
  def q22GlobalSales(s: SparkSession, dir: String): DataFrame = {
    val avgBal = Tables.customer(s, dir).where(col("c_acctbal") > 0)
      .agg(round(avg("c_acctbal"), 4).as("avg_bal"))
    val recent = Tables.orders(s, dir)
      .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select("o_custkey")
    Tables.customer(s, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  /** Top-3 orders per customer — the canonical ranking window. */
  def windowTopOrders(s: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        row_number().over(w).as("rk"))
      .where(col("rk") <= n)
      .orderBy("o_custkey", "rk")
  }

  /** 1-day tumbling-window counts per event type — written with
    * `window()` so the identical plan runs under Structured Streaming.
    */
  def eventsTumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("day", "event_type")

  /** 1-day HOPPING (sliding) windows with a 12-hour hop: every event
    * lands in exactly two windows, so the fan-out is bounded by
    * window/hop — the overlapping-window aggregation Structured
    * Streaming runs with the same `window(ts, size, hop)` call.
    */
  def eventsHopping(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day", "12 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Daily-count anomaly detection: flag (event_type, day) cells
    * whose count sits ≥ `z` population standard deviations from that
    * type's daily mean. The heavy stage is the one map-side-partial
    * daily reduction of events; mean/variance then come from a window
    * over the DAYS×TYPES frame (metadata-sized at any corpus scale —
    * no second events scan, and the window's event_type exchange
    * moves only that tiny frame). Mean and variance derive from
    * exact integer aggregates (Σn, Σn², N — associative, so partition
    * order cannot perturb them), making the z-doubles
    * bit-deterministic across engines. Σn² squares and sums as
    * DECIMAL(38,0): a long·long square would silently wrap past
    * n ≈ 3e9 events/day, and a double sum over the unordered window
    * frame would go order-sensitive past 2^53 — the decimal is exact
    * to 1e38 (mirroring the HUGEINT DuckDB's sum(BIGINT) promotes
    * to), and only the final single cast to double rounds, correctly
    * and identically on both engines. The z-score is rounded to 4dp
    * before the threshold so the flag predicate compares identical
    * values on both sides.
    */
  def eventsAnomaly(s: SparkSession, dir: String, z: Double = 2.0): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val mean = col("s1").cast("double") / col("nd")
    val nDec = col("n").cast("decimal(19,0)")
    daily
      .withColumn("s1", sum("n").over(byType))
      .withColumn("s2", sum(nDec * nDec).over(byType))
      .withColumn("nd", count(lit(1)).over(byType))
      // a zero-variance series (one day, or constant daily counts)
      // has no z-score — guard BEFORE the division (r12 fuzz: the
      // planted constant-count type hit ANSI DIVIDE_BY_ZERO)
      .withColumn("vr",
        col("s2").cast("double") / col("nd") - mean * mean)
      .where(col("vr") > 0)
      .withColumn("zscore", round((col("n") - mean) / sqrt(col("vr")), 4))
      .where(abs(col("zscore")) >= z)
      .select(col("event_type"), col("day"), col("n"), col("zscore"))
      .orderBy("event_type", "day")
  }

  /** ROBUST (MAD) anomaly detection — the median-based twin of
    * [[eventsAnomaly]]: z-scores break when the baseline itself is
    * contaminated (one huge outlier day inflates σ and hides the
    * rest — masking), while the median and the median absolute
    * deviation have a 50% breakdown point. robust_z =
    * (n − median) / (1.4826·MAD), flagged at |rz| ≥ 2.5 (the driver
    * fixture's daily counts are Poisson-tame — 3.0 finds nothing at
    * sf0.01, 2.5 flags a stable handful at every SF); both medians
    * are exact interpolated percentiles over the metadata-sized
    * daily frame (identical doubles both engines — counts are
    * integers), the 1.4826 consistency constant a shared double
    * literal. Same one-daily-reduction skeleton; types with MAD = 0
    * (constant series) are excluded rather than divided by zero.
    */
  def eventsAnomalyMad(s: SparkSession, dir: String,
                       k: Double = 2.5): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val med = daily.groupBy("event_type")
      .agg(expr("percentile(n, 0.5)").as("med"))
    val withMed = daily.join(med, "event_type")
    val mad = withMed.groupBy("event_type")
      .agg(expr("percentile(abs(n - med), 0.5)").as("mad"))
    withMed.join(mad, "event_type")
      .where(col("mad") > 0)
      .withColumn("robust_z",
        round((col("n") - col("med")) / (lit(1.4826) * col("mad")), 4))
      .where(abs(col("robust_z")) >= k)
      .select(col("event_type"), col("day"), col("n"),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
        col("robust_z"))
      .orderBy("event_type", "day")
  }

  /** ONLINE anomaly detection — each day scored against the stats of
    * its PRECEDING days only (ROWS … 1 PRECEDING cumulative windows),
    * which is the semantics a streaming detector can actually
    * compute: no day's score ever revises, so the batch output is the
    * exact replay of what [[graft.streaming.AnomalyStream]] emits as
    * days close. Same plan skeleton as [[eventsAnomaly]] (one daily
    * reduction, windows over the metadata-sized frame) and the same
    * exact-integer determinism discipline; additionally the
    * variance-positivity gate compares nd·Σn² > (Σn)² in EXACT
    * decimal arithmetic — deciding "is there any variance yet" on the
    * rounded double would let a last-ulp wobble near zero flip a
    * division-by-zero — and a `warmupDays` floor keeps the noisy
    * first prefix from flagging everything.
    */
  def eventsAnomalyOnline(s: SparkSession, dir: String, z: Double = 2.0,
                          warmupDays: Int = 7): DataFrame = {
    val prior = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val mean = col("s1").cast("double") / col("nd")
    val nDec = col("n").cast("decimal(19,0)")
    daily
      .withColumn("s1", sum("n").over(prior))
      .withColumn("s2", sum(nDec * nDec).over(prior))
      .withColumn("nd", count(lit(1)).over(prior))
      .where(col("nd") >= warmupDays &&
        col("nd").cast("decimal(19,0)") * col("s2") >
          col("s1").cast("decimal(19,0)") * col("s1").cast("decimal(19,0)"))
      .withColumn("zscore", round((col("n") - mean)
        / sqrt(col("s2").cast("double") / col("nd") - mean * mean), 4))
      .where(abs(col("zscore")) >= z)
      .select(col("event_type"), col("day"), col("n"), col("zscore"))
      .orderBy("event_type", "day")
  }

  /** CHANGEPOINT detection — the single most likely mean-shift day
    * per event type, by the CUSUM split statistic (the offline form
    * of what a drift monitor alerts on; the anomaly family flags
    * single outlier DAYS, this finds the day the LEVEL moved).
    *
    * For daily counts x_1..x_nd with prefix sums cum_t, the split
    * score at t is |mean_before − mean_after| weighted by the split
    * sizes — equivalently |nd·cum_t − t·tot| (both engines compute it
    * in EXACT integer arithmetic: nd ≤ days, cum ≤ total events, so
    * the product sits far below 2^63). Ranking on the integer score
    * with an earliest-day tiebreak makes the argmax bit-deterministic
    * — no float comparison ever decides the winner; the two reported
    * means are single exact-integer divisions rounded at 4dp.
    *
    * Scale shape: the same skeleton as [[eventsAnomaly]] — ONE
    * map-side-partial daily reduction of the events table, then
    * windows over the metadata-sized days×types frame. Nothing
    * corpus-sized is windowed.
    */
  def eventsChangepoint(s: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val byDay = byType.orderBy("day")
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    daily
      .withColumn("t", row_number().over(byDay))
      .withColumn("cum",
        sum("n").over(byDay.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("nd", count(lit(1)).over(byType))
      .withColumn("tot", sum("n").over(byType))
      // a split must leave both sides non-empty
      .where(col("t") < col("nd"))
      .withColumn("score", abs(col("nd") * col("cum") - col("t") * col("tot")))
      .withColumn("rk", row_number().over(
        byType.orderBy(col("score").desc, col("day"))))
      .where(col("rk") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("t").cast("long").as("days_before"),
        (col("nd") - col("t")).cast("long").as("days_after"),
        col("score"),
        round(col("cum").cast("double") / col("t"), 4).as("mean_before"),
        round((col("tot") - col("cum")).cast("double") / (col("nd") - col("t")),
          4).as("mean_after"))
      .orderBy("event_type")
  }

  /** 30-minute-gap sessionization: lag → new-session flag → running
    * sum (the standard two-window formulation).
    */
  def eventsSessionize(s: SparkSession, dir: String,
                       gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gap = unix_timestamp(col("ts")) -
      unix_timestamp(lag("ts", 1).over(byUser))
    Tables.events(s, dir)
      .withColumn("new_session",
        when(gap.isNull || gap > gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(byUser))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"))
      .orderBy("user_id", "session_id")
  }

  /** TPC-H Q15 shape: aggregate a supplier revenue "view", then keep
    * the argmax row(s). The view is supplier-sized, so it feeds its
    * two consumers (the scalar max and the winner filter) through a
    * localCheckpoint instead of two lineitem scans; the 1-row max
    * broadcasts (the Q22 scalar-aggregate pattern — never a
    * single-partition window sort over the whole aggregate, which is
    * the naive formulation's scale trap). Revenue is rounded to 2dp
    * BEFORE the comparison so argmax ties are decided on the exact
    * cents both engines print, not on last-ulp sum noise.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
      .localCheckpoint()
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(mx), col("total_revenue") === col("mx"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17 shape: the correlated scalar subquery ("lineitems
    * below 20% of their part's average quantity") DECORRELATED into
    * aggregate-then-rejoin — the rewrite engines apply because a
    * per-row subquery re-scan is quadratic. The part predicate
    * broadcasts, both passes over lineitem are 3-column pruned scans
    * gated by that broadcast join (recompute-over-persist per SURVEY
    * §4 — the pipeline is narrow codegen, nothing exploded), and the
    * per-part thresholds are part-sized so AQE broadcasts the rejoin.
    * avg(l_quantity) is an exact-integer sum over an exact count —
    * one division, bit-identical on both engines.
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir)
      .where(col("p_brand") === "Brand#3" && col("p_size") <= 25)
      .select(col("p_partkey"))
    def qualifying = Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val bars = qualifying.groupBy("l_partkey")
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_bar"))
    qualifying.join(bars, "l_partkey")
      .where(col("l_quantity") < col("qty_bar"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** Weekly cohort retention — the classic growth-analytics matrix:
    * users grouped by the week of their FIRST event, and for each
    * (cohort, weeks-since) cell, how many of them were active. Both
    * per-user aggregates (first-seen and active-weeks) key on
    * user_id, so they satisfy their distribution from the loader's
    * user_id spread without a second exchange (HashPartitioning on
    * user_id satisfies the (user_id, week) clustering too); the
    * cohort-size table is cohort-count-sized and broadcasts into the
    * rate join. weeks_since is integer day arithmetic over
    * Monday-truncated dates — exact on both engines.
    */
  def eventsRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val firsts = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date")
        .as("cohort_week"))
    val active = ev
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date")
        .as("week"))
      .distinct()
    // weeks²-sized; checkpointed because both the rate join and the
    // cohort-size derivation read it — left lazy, each would re-run
    // the two events aggregations
    val matrix = firsts.join(active, "user_id")
      .select(col("cohort_week"),
        expr("datediff(week, cohort_week) div 7").as("weeks_since"))
      .groupBy("cohort_week", "weeks_since")
      .agg(count(lit(1)).as("n_users"))
      .localCheckpoint(true)
    // cohort size = the weeks_since=0 cell: every user is active in
    // the week of their own first event, so the matrix already holds
    // it — deriving it from the (weeks²-sized) matrix instead of a
    // second firsts aggregation saves a full events scan + agg
    val cohortSizes = matrix.where(col("weeks_since") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_n"))
    matrix.join(broadcast(cohortSizes), "cohort_week")
      .select(col("cohort_week"), col("weeks_since"), col("n_users"),
        round(col("n_users").cast("double") / col("cohort_n"), 4)
          .as("retention"))
      .orderBy("cohort_week", "weeks_since")
  }

  /** Event-sequence transition matrix (the Markov-chain view of user
    * behavior): per user, consecutive event pairs by time → counts
    * and row-normalized probabilities per source state. The lag
    * window keys on user_id, so it reuses the loader's user_id
    * spread; the aggregate's exchange carries only (from, to) pairs
    * (state-space-sized). Probability = BIGINT count / BIGINT row
    * total — one division, bit-identical on both engines. Ties in
    * time break on event_id, the sessionize discipline.
    */
  def eventsTransitions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("from_type", lag("event_type", 1).over(byUser))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      // (states²)-sized; checkpointed because the row totals and the
      // probability projection both read it
      .localCheckpoint(true)
    val totals = pairs.groupBy("from_type")
      .agg(sum("n").as("row_n"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("row_n"), 4).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Semi-structured ETL: the events `props` JSON column parsed at
    * scan time (`get_json_object` is codegen — schema-on-read without
    * a UDF or a pre-materialized parse), banded and aggregated. The
    * JSON path evaluation rides inside the scan's projection, so at
    * 100 TB the parse costs one pass and the aggregate's exchange
    * carries only (type, band) groups.
    */
  def eventsJsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        // try_cast (r16 fuzz): a non-numeric payload value must read
        // as NULL, not throw the whole job under ANSI — the WAL-parse
        // convention; the oracle mirrors with TRY_CAST
        get_json_object(col("props"), "$.k").try_cast("long").as("k"),
        col("value"))
      .select(col("event_type"), expr("k div 25").as("k_band"),
        col("value"))
      .groupBy("event_type", "k_band")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("event_type", "k_band")

  /** TOP PATHS — the most frequent length-3 event sequences, the
    * n-gram generalization of [[eventsTransitions]]'s Markov pairs
    * (what funnels are mined FROM when the stages aren't known in
    * advance): two `lead`s over the same per-user (ts, event_id)
    * window the transitions/sessionize family already uses — the
    * loader's user_id spread satisfies it, no extra exchange — then
    * one (t1,t2,t3)-keyed partial-agg count (≤ states³ groups) and a
    * global TopKAgg over the path table (states³-sized, not
    * event-sized). Paths cross session boundaries deliberately; a
    * session-scoped variant composes with sessionize's session_id.
    */
  def eventsTopPaths(s: SparkSession, dir: String,
                     topN: Int = 10): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val paths = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"))
      .withColumn("t2", lead("t1", 1).over(byUser))
      .withColumn("t3", lead("t1", 2).over(byUser))
      .where(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3")
      .agg(count(lit(1)).as("n"))
      // deterministic dense ranking without a second shuffle: the
      // path table is states³-sized, one partition sorts it
      .withColumn("path", concat_ws(" > ", col("t1"), col("t2"), col("t3")))
    val w = Window.orderBy(col("n").desc, col("path"))
    paths.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topN)
      .select(col("rank"), col("path"), col("n"))
      .orderBy("rank")
  }

  /** CALENDAR DENSIFICATION + moving aggregate — the gap-fill every
    * time-series report needs before a window makes sense: a sparse
    * daily series (here: high-value events, value > 300 — most
    * (type, day) cells are EMPTY) left-joined onto the dense
    * type × calendar grid with zero fill, then a 7-day trailing mean
    * over the FILLED series. Without densification the moving window
    * silently skips empty days and the "7-day average" averages the
    * nearest 7 NON-EMPTY days — wrong on any sparse series.
    *
    * Scale shape: the calendar comes from `sequence(lo, hi)` off a
    * 1-row bounds aggregate (two longs to the driver), the grid is
    * types × days (metadata-sized — grouping keys, not events), and
    * events contribute through one keyed partial-agg count. Integer
    * day arithmetic; the moving mean is a ≤7-int sum / count — exact
    * on both engines.
    */
  def eventsGapFill(s: SparkSession, dir: String,
                    minValue: Double = 300.0): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"), col("value"))
    val daily = ev.where(col("value") > minValue)
      .groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    // report range = the FULL event calendar (bounds of the unfiltered
    // stream), not the sparse series' own — leading/trailing empty
    // days are part of the answer. Bounds AND the type dictionary come
    // from ONE metadata aggregate (2 longs + the type set, 1 row,
    // checkpointed for its two explode consumers) — deriving them
    // separately cost a third full events scan (ScanAudit)
    val meta = ev.agg(min("d").as("lo"), max("d").as("hi"),
      collect_set("event_type").as("tys")).localCheckpoint(true)
    val cal = meta.select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val grid = meta.select(explode(col("tys")).as("event_type"))
      .crossJoin(cal)
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(-6, 0)
    grid.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("ma7", round(avg("n").over(w), 4))
      .select(col("event_type"),
        date_add(lit("1970-01-01").cast("date"), col("d").cast("int"))
          .cast("string").as("day"),
        col("n"), col("ma7"))
      .orderBy("event_type", "day")
  }

  /** PER-USER FEATURE TABLE — the feature-store shape an ML training
    * join consumes (churn/engagement models): per (user, day) over
    * the DENSE event calendar — daily event count, lag-1 count,
    * trailing-7-day sum, and days-since-last-activity. A missing day
    * is an observed 0 (the gap-fill rule), so lags and rolling sums
    * mean calendar time, not event time; every feature is an exact
    * integer. user×calendar is the feature table's natural
    * cardinality; windows key by user_id (the loader's spread key),
    * calendar bounds come from one metadata aggregate.
    */
  def eventsUserFeatures(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val daily = ev.groupBy("user_id", "d").agg(count(lit(1)).as("n"))
    val meta = ev.agg(min("d").as("lo"), max("d").as("hi"))
      .localCheckpoint(true)
    val cal = meta.select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val users = ev.select("user_id").distinct()
    val wOrd = Window.partitionBy("user_id").orderBy("d")
    val w7 = wOrd.rowsBetween(-6, 0)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    users.crossJoin(broadcast(cal))
      .join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"), coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("lag1", coalesce(lag("n", 1).over(wOrd), lit(0L)))
      .withColumn("roll7", sum("n").over(w7))
      .withColumn("last_active",
        max(when(col("n") > 0, col("d"))).over(wPrev))
      .select(col("user_id"),
        date_add(lit("1970-01-01").cast("date"), col("d").cast("int"))
          .cast("string").as("day"),
        col("n"), col("lag1"), col("roll7"),
        coalesce(col("d") - col("last_active"), lit(-1L))
          .as("days_since_active"))
      .orderBy("user_id", "day")
  }

  /** GROUP-SEQUENTIAL A/B MONITORING — the peeking curve a dashboard
    * actually draws: per day t, the Welch z-statistic on the
    * CUMULATIVE per-variant moments (counts / sums / sums-of-squares
    * of the centi-unit metric — two-level running sums over exact
    * integer day partials, the backlog idiom), plus the crossing
    * flag against a constant conservative boundary (2.797, the
    * O'Brien-Fleming final bound at K = 5 — a fixed-z peek at every
    * day is exactly the inflation this guards). Day grid is the
    * union calendar × both variants so cumulative windows stay
    * aligned when one variant is silent for a day. z is a pure
    * function of exact integers — identical doubles on both engines.
    */
  def eventsAbSequential(s: SparkSession, dir: String,
                         bound: Double = 2.797): DataFrame = {
    val ev = Tables.events(s, dir)
      .select((col("user_id") % 2).as("variant"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("d"),
        expr("cast(round(value * 100) as bigint)").as("micro"))
    val g = ev.groupBy("variant", "d")
      .agg(count(lit(1)).as("n"), sum("micro").as("sx"),
        sum(col("micro") * col("micro")).as("qx"))
    val days = ev.select("d").distinct()
    val variants = days.sparkSession.range(0, 2)
      .toDF().select(col("id").as("variant"))
    val w = Window.partitionBy("variant").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val c = days.crossJoin(broadcast(variants))
      .join(g, Seq("variant", "d"), "left")
      .select(col("variant"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sx"), lit(0L)).as("sx"),
        coalesce(col("qx"), lit(0L)).as("qx"))
      .select(col("variant"), col("d"),
        sum("n").over(w).as("cn"), sum("sx").over(w).as("cs"),
        sum("qx").over(w).as("cq"))
    def side(v: Int, suf: String) = c.where(col("variant") === v)
      .select(col("d"), col("cn").as(s"n_$suf"),
        col("cs").as(s"s_$suf"), col("cq").as(s"q_$suf"))
    def mean(sc: org.apache.spark.sql.Column,
             n: org.apache.spark.sql.Column) = sc.cast("double") / n
    def variance(n: org.apache.spark.sql.Column,
                 sc: org.apache.spark.sql.Column,
                 q: org.apache.spark.sql.Column) =
      // numerator in DECIMAL(38,0): n·q reaches n²·micro² and a
      // BIGINT wraps silently past ~3·10⁵ events/arm where DuckDB's
      // HUGEINT keeps exact — decimal holds to 10³⁸ and only the
      // final ratio drops to double (same value, same bits)
      (n.cast("decimal(38,0)") * q.cast("decimal(38,0)") -
        sc.cast("decimal(38,0)") * sc.cast("decimal(38,0)"))
        .cast("double") / (n * (n - 1)).cast("double")
    side(0, "a").join(side(1, "b"), "d")
      .where(col("n_a") > 1 && col("n_b") > 1)
      .withColumn("z",
        (mean(col("s_a"), col("n_a")) - mean(col("s_b"), col("n_b")))
          / sqrt(variance(col("n_a"), col("s_a"), col("q_a")) / col("n_a")
            + variance(col("n_b"), col("s_b"), col("q_b")) / col("n_b")))
      .select(
        date_add(lit("1970-01-01").cast("date"), col("d").cast("int"))
          .cast("string").as("day"),
        col("n_a"), col("n_b"), round(col("z"), 4).as("z"),
        when(abs(col("z")) >= bound, lit(1L)).otherwise(lit(0L))
          .as("signif"))
      .orderBy("day")
  }

  /** PIVOT — the wide BI-export shape: daily event counts, one
    * column per event type. Pivot values are EXPLICIT (the bounded,
    * contract-fixed type set): with explicit values Spark compiles
    * the pivot to a single conditional aggregate — one exchange, no
    * extra distinct-values job, and a schema that cannot drift with
    * the data (an implicit pivot at 100 TB first runs a full
    * distinct scan and then widens by whatever cardinality it found).
    */
  def eventsPivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("ts").cast("date").cast("string").as("day"),
        col("event_type"))
      .groupBy("day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day")

  /** EXPONENTIALLY-WEIGHTED daily trend per event type (α=1/2,
    * truncated at 14 days) — the smoothing curve trend dashboards
    * draw over the gap-filled series. The EWMA recurrence is
    * sequential; the truncated form is PARALLEL: each day's value is
    * a weighted sum over its own trailing window, computed as a
    * BANDED SELF-JOIN on the dense (type × calendar) grid — a
    * metadata-sized frame, so the quadratic-in-window-width join is
    * bounded by types·days·14, never by event volume. Weights are
    * exact powers of two (1<<lag) and counts integers, so numerator
    * and denominator are exact BIGINT sums — one double division at
    * the end, 4dp (the gap-fill integer discipline; a plain window
    * can't express lag-dependent weights).
    */
  def eventsEwma(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val daily = ev.groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    val meta = ev.agg(min("d").as("lo"), max("d").as("hi"),
      collect_set("event_type").as("tys")).localCheckpoint(true)
    val cal = meta.select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val grid = meta.select(explode(col("tys")).as("event_type"))
      .crossJoin(cal)
    val dense = grid.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"))
      .localCheckpoint(true)
    val rhs = dense.select(col("event_type"), col("d").as("j"), col("n"))
    dense.select("event_type", "d")
      .join(rhs, Seq("event_type"))
      .where(col("j").between(col("d") - 13, col("d")))
      .select(col("event_type"), col("d"),
        expr("n * shiftleft(CAST(1 AS BIGINT), CAST(13 - (d - j) AS INT))")
          .as("wn"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(13 - (d - j) AS INT))")
          .as("w"))
      .groupBy("event_type", "d")
      .agg(sum("wn").as("num"), sum("w").as("den"))
      .select(col("event_type"),
        date_add(lit("1970-01-01").cast("date"), col("d").cast("int"))
          .cast("string").as("day"),
        round(col("num").cast("double") / col("den"), 4).as("ewma"))
      .orderBy("event_type", "day")
  }

  /** TPC-H Q16 shape (recast — no partsupp table in the testdata, so
    * lineitem plays the part↔supplier relation): DISTINCT-COUNT over a
    * join with a NOT-IN exclusion. Per (p_type, size band): how many
    * distinct suppliers ship such parts, excluding "complained"
    * suppliers (negative account balance — the comment-LIKE filter's
    * analog). The exclusion is a left_anti against a supplier-sized
    * set (never widens fact rows), and count(distinct) keys the
    * aggregate by the group — the expand+two-phase distinct plan — so
    * no per-group set materializes on any single node at scale.
    */
  def q16SupplierCount(s: SparkSession, dir: String): DataFrame = {
    val complained = Tables.supplier(s, dir)
      .where(col("s_acctbal") < 0).select("s_suppkey")
    val parts = Tables.part(s, dir)
      .where(col("p_type") =!= "PROMO" && col("p_size") <= 30)
      .select(col("p_partkey"), col("p_type"),
        (col("p_size") - (col("p_size") % 10)).cast("long").as("size_band"))
    Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(complained, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy("p_type", "size_band")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_type"), col("size_band"))
  }

  /** TPC-H Q20 shape (recast onto lineitem as the supply relation):
    * the NESTED SEMI CHAIN — a filter on parts gates an aggregate on
    * the fact table, whose threshold test gates a semi-join on
    * suppliers, which joins a bounded dim for display. Suppliers who
    * shipped MORE than twice the per-part average 1996 volume of any
    * SMALL-type part: per-(part, supp) sums and the per-part mean both
    * reuse one l_partkey-keyed exchange; qualification collapses to a
    * distinct supplier set (supplier-sized) before touching the
    * supplier table, and nation broadcasts.
    */
  def q20ExcessSupply(s: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(s, dir)
      .where(col("p_type") === "SMALL").select("p_partkey")
    val shipped = Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("l_quantity").as("qty"))
    // per-part mean over its suppliers, derived FROM the (part, supp)
    // aggregate (partition-local second agg — the q13 two-level shape)
    val perPart = shipped.groupBy("l_partkey")
      .agg((sum("qty") / count(lit(1))).as("avg_qty"))
    val qualifying = shipped.join(perPart, "l_partkey")
      .where(col("qty") > col("avg_qty") * 2.0)
      .select("l_suppkey").distinct()
    Tables.supplier(s, dir)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey")
  }

  /** DAU/WAU STICKINESS — the engagement ratio every product
    * dashboard carries: per ISO (Monday-truncated) week, the weekly
    * distinct actives, the mean of the seven daily distinct-active
    * counts, and their ratio. Both distinct aggregates key by
    * (period, user) first — the two-phase distinct plan, never a
    * per-group set — and the day→week rollup joins week-sized frames.
    * The ratio is derived from exact BIGINT counts; the mean's single
    * division and the ratio division are the only float ops (the
    * events_retention discipline).
    */
  def eventsStickiness(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"),
      col("ts").cast("date").as("day"),
      date_trunc("week", col("ts")).cast("date").as("week"))
    val dau = ev.select("user_id", "day", "week").distinct()
      .groupBy("week", "day").agg(count(lit(1)).as("dau"))
    val wau = ev.select("user_id", "week").distinct()
      .groupBy("week").agg(count(lit(1)).as("wau"))
    dau.groupBy("week")
      .agg(sum("dau").as("sum_dau"), count(lit(1)).as("n_days"))
      .join(wau, "week")
      .select(col("week").cast("string").as("week"), col("n_days"),
        col("wau"),
        round(col("sum_dau").cast("double") / col("n_days"), 4)
          .as("avg_dau"),
        round(col("sum_dau").cast("double") / (col("n_days") * col("wau")),
          4).as("stickiness"))
      .orderBy("week")
  }

  /** TPC-H Q9 shape — product-type profit by (nation, year): the
    * widest fact-side join tree in the suite (lineitem ⋈ part ⋈
    * supplier ⋈ nation ⋈ orders). The driver schema carries no
    * partsupp, so unit cost is the part's retail price discounted 20%
    * (deterministic column arithmetic, the shape is what matters):
    * profit = extendedprice·(1−discount) − 0.8·retailprice·quantity.
    * Order of joins: the selective part filter (name token) broadcast
    * FIRST so the fact stream shrinks before the wider supplier and
    * orders joins; nation broadcast; only (nation, year, profit)
    * reach the aggregate exchange.
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir)
      .where(col("p_name").contains("widget"))
      .select("p_partkey", "p_retailprice")
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(s, dir).select("n_nationkey", "n_name")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      // per-row CENTS quantization before the sum: a raw double sum
      // is fold-order-dependent, and Spark's partial-aggregation
      // order shifts with partitioning (r12 fuzz: two appended
      // lineitem rows flipped a .485 rounding boundary); the integer
      // sum is exact in any order and the oracle mirrors the same
      // per-row round
      .select(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        expr("CAST(round((l_extendedprice * (1 - l_discount) " +
          "- 0.8 * p_retailprice * l_quantity) * 100) AS BIGINT)")
          .as("cents"))
      .groupBy("nation", "o_year")
      .agg(round(sum("cents").cast("double") / 100.0, 2).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape — "important stock": per-group value vs a
    * GLOBAL-share threshold. Per-part line value aggregates once;
    * the global mean derives FROM that aggregate (never a second
    * fact scan) and broadcasts as a 1-row crossJoin (the Q22 scalar
    * pattern); parts 50% above the mean survive — the threshold is
    * relative to the mean, not an absolute share, so selectivity is
    * stable as the part universe scales. The part-sized aggregate is
    * computed once and reused for both the scalar and the filter —
    * localCheckpoint pins it (the q15 two-consumer rule).
    */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(s, dir)
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice")).as("value"))
      .localCheckpoint(true)
    val total = perPart.agg(avg("value").as("mv"))
    perPart.crossJoin(broadcast(total))
      .where(col("value") > col("mv") * 1.5)
      .select(col("l_partkey").as("p_partkey"),
        round(col("value"), 2).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** TPC-H Q12 shape — late-shipment priority counts by line status:
    * fact ⋈ orders with the date-arithmetic predicate (shipped > 60
    * days after order) evaluated inside the join's codegen stage,
    * CASE-conditional aggregation splitting critical (URGENT/HIGH)
    * from other priorities. The exchange carries only (status,
    * two flags); counts are exact BIGINTs.
    */
  def q12LatePriority(s: SparkSession, dir: String): DataFrame = {
    val crit = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linestatus", "l_shipdate")
      .join(Tables.orders(s, dir)
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_linestatus")
      .agg(sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!crit, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q2 shape — min-cost supplier per part: the correlated MIN
    * subquery decorrelated into aggregate-then-rejoin (the q17
    * discipline) with an ARGMIN JOIN-BACK on equality of the
    * 2dp-rounded cost (ties decided on printed cents, the q15 rule —
    * all achieving suppliers return). Supply cost is each supplier's
    * mean unit price for the part (the driver schema has no
    * partsupp); the region gate is a broadcast semi on the supplier
    * side BEFORE cost aggregation, so out-of-region suppliers never
    * enter the min.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val euroSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir)
              .where(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
    val smallParts = Tables.part(s, dir)
      .where(col("p_type") === "SMALL" && col("p_size") < 15)
      .select("p_partkey", "p_name")
    val cost = Tables.lineitem(s, dir)
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"),
        col("s_name"), col("n_name"))
      .agg(round(avg(col("l_extendedprice") / col("l_quantity")), 2)
        .as("cost"))
      .localCheckpoint(true)
    val minCost = cost.groupBy(col("p_partkey").as("mk"))
      .agg(min("cost").as("min_cost"))
    cost.join(minCost,
        col("p_partkey") === col("mk") && col("cost") === col("min_cost"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("n_name"), col("cost"))
      .orderBy(col("p_partkey"), col("s_name"))
  }

  /** A/B TEST REPORT — Welch's z on event values between two user
    * cohorts (variant = user_id mod 2, the deterministic hash-split
    * an experimentation system would assign): per event type, cohort
    * sizes, means, and the z statistic for the mean difference.
    *
    * Bit-deterministic under the exact-aggregate rule: values are
    * 2dp, so micro = round(value*100) is an exact BIGINT; per-cohort
    * (n, S=Σx, Q=Σx²) are exact integer sums, and mean/variance/z
    * evaluate identical doubles on both engines from those integers
    * (z is scale-invariant, so it runs in micro units throughout —
    * no /100 to disagree on). Plan: one scan, one (type, variant)
    * aggregate, a type-keyed self-pivot of the 2-row cohort pairs —
    * aggregate-sized joins only. At petabyte row counts the Σx²
    * BIGINT would need decimal(38,0); the shape is unchanged.
    */
  def eventsAbTest(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(s, dir)
      .select(col("event_type"), (col("user_id") % 2).as("variant"),
        expr("cast(round(value * 100) as bigint)").as("micro"))
      .groupBy("event_type", "variant")
      .agg(count(lit(1)).as("n"), sum("micro").as("sx"),
        sum(col("micro") * col("micro")).as("qx"))
    def side(v: Int, suf: String) = g.where(col("variant") === v)
      .select(col("event_type"), col("n").as(s"n_$suf"),
        col("sx").as(s"s_$suf"), col("qx").as(s"q_$suf"))
    def mean(sc: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      sc.cast("double") / n
    def variance(n: org.apache.spark.sql.Column,
                 sc: org.apache.spark.sql.Column,
                 q: org.apache.spark.sql.Column) =
      // DECIMAL(38,0) numerator — the headroom discipline the doc
      // above promises ("at petabyte row counts the Σx² BIGINT would
      // need decimal(38,0)"), now actually applied: n·q wraps a
      // BIGINT past ~3·10⁵ events/arm
      (n.cast("decimal(38,0)") * q.cast("decimal(38,0)") -
        sc.cast("decimal(38,0)") * sc.cast("decimal(38,0)"))
        .cast("double") / (n * (n - 1)).cast("double")
    side(0, "a").join(side(1, "b"), "event_type")
      .where(col("n_a") > 1 && col("n_b") > 1)
      .withColumn("z",
        (mean(col("s_a"), col("n_a")) - mean(col("s_b"), col("n_b")))
          / sqrt(variance(col("n_a"), col("s_a"), col("q_a")) / col("n_a")
            + variance(col("n_b"), col("s_b"), col("q_b")) / col("n_b")))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(mean(col("s_a"), col("n_a")) / 100.0, 4).as("mean_a"),
        round(mean(col("s_b"), col("n_b")) / 100.0, 4).as("mean_b"),
        round(col("z"), 4).as("z"))
      .orderBy("event_type")
  }

  /** CUPED-ADJUSTED A/B REPORT (Deng et al., WSDM'13 — the variance
    * reduction every modern experimentation platform applies):
    * per-user pre-period spend X (days before the data midpoint) is
    * the covariate for post-period spend Y; θ = cov(X,Y)/var(X)
    * pooled over all users, and the adjusted metric is
    * Y − θ·(X − X̄). The trap at scale is that Y_adj is a FLOAT per
    * user, and any per-user float aggregate is fold-order-dependent
    * — but Y_adj is AFFINE in (x, y), so every reported statistic
    * closes over the exact integer moments instead:
    * mean_v(Y_adj) = mean_v(y) − θ·(mean_v(x) − x̄) and
    * var_v(Y_adj) = var_v(y) − 2θ·cov_v(x,y) + θ²·var_v(x). All
    * sums are BIGINT micro-units (per-petabyte growth ⇒
    * decimal(38,0), shape unchanged); θ is a ratio of exact longs,
    * so both engines emit identical doubles. One scan, one per-user
    * aggregate, one 2-row variant aggregate.
    */
  def eventsAbCuped(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"),
      expr("CAST(round(value * 100) AS BIGINT)").as("micro"))
    val bounds = ev.agg(expr("(min(d) + max(d)) div 2").as("mid"))
    val per = ev.crossJoin(broadcast(bounds))
      .groupBy("user_id")
      .agg(sum(when(col("d") < col("mid"), col("micro")).otherwise(0L))
          .as("x"),
        sum(when(col("d") >= col("mid"), col("micro")).otherwise(0L))
          .as("y"))
      .withColumn("variant", col("user_id") % 2)
      .localCheckpoint(true)
    val pooled = per.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"), sum(expr("x * y")).as("sxy"),
      sum(expr("x * x")).as("sxx"))
    val v = per.groupBy("variant").agg(count(lit(1)).as("nv"),
      sum("x").as("vsx"), sum("y").as("vsy"),
      sum(expr("x * y")).as("vsxy"), sum(expr("x * x")).as("vsxx"),
      sum(expr("y * y")).as("vsyy"))
    // 1.0D not 1.0: a bare 1.0 literal is DECIMAL(2,1) in Spark SQL
    // and round(decimal, n) STAYS decimal, while the DuckDB oracle's
    // HUGEINT sums force DOUBLE — the stats must ride DOUBLE on both
    // engines or the driver's schema hash diverges (r10 red row).
    val theta = "(n * sxy - sx * sy) * 1.0D / (n * sxx - sx * sx)"
    val vary = "(nv * vsyy - vsy * vsy) * 1.0D / (nv * (nv - 1))"
    val covv = "(nv * vsxy - vsx * vsy) * 1.0D / (nv * (nv - 1))"
    val varx = "(nv * vsxx - vsx * vsx) * 1.0D / (nv * (nv - 1))"
    // var_ratio = var(Y_adj)/var(Y) — the REMAINING variance fraction
    // (1 − reduction); the guard drops degenerate variants (a single
    // user, or zero post-period variance) where the ratio is 0/0.
    v.crossJoin(broadcast(pooled))
      .where(expr(s"nv >= 2 AND ($vary) > 0"))
      .select(col("variant").cast("long").as("variant"),
        col("nv").as("n_users"),
        expr(s"round($theta, 6)").as("theta"),
        expr("round(vsy * 1.0D / nv / 100.0, 4)").as("mean_y"),
        expr(s"round((vsy * 1.0D / nv - ($theta) * " +
          s"(vsx * 1.0D / nv - sx * 1.0D / n)) / 100.0, 4)")
          .as("mean_y_adj"),
        expr(s"round((($vary) - 2 * ($theta) * ($covv) + " +
          s"($theta) * ($theta) * ($varx)) / ($vary), 4)")
          .as("var_ratio"))
      .orderBy("variant")
  }

  /** SEASONAL-NAIVE FORECAST BACKTEST — the baseline every real
    * forecaster must beat, evaluated in-sample: predict each day's
    * event count with the count 7 days earlier, report per-type MAE
    * over the dense daily grid (zero-filled — a missing day is a 0
    * count, not a skipped evaluation). Integer-exact end to end:
    * counts and absolute errors are BIGINTs, the MAE is one division
    * rounded at 4dp. Grid bounds derive from the DATA (1-row
    * broadcast), never a hard-coded calendar window. Scale: one scan
    * → (type, day) aggregate; the dense grid is (types × days) —
    * metadata-sized — and the lag is a window over it, not the raw
    * events.
    */
  def eventsForecastNaive(s: SparkSession, dir: String,
                          lagDays: Int = 7): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val daily = ev.groupBy("event_type", "d")
      .agg(count(lit(1)).as("n"))
    val meta = ev.agg(min("d").as("lo"), max("d").as("hi"),
      collect_set("event_type").as("tys")).localCheckpoint(true)
    val grid = meta.select(explode(col("tys")).as("event_type"))
      .crossJoin(meta.select(explode(sequence(col("lo"), col("hi")))
        .as("d")))
    val dense = grid.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("d")
    dense.withColumn("pred", lag("n", lagDays).over(w))
      .where(col("pred").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("n") - col("pred"))).as("total_abs_err"))
      .select(col("event_type"), col("n_days"), col("total_abs_err"),
        round(col("total_abs_err").cast("double") / col("n_days"), 4)
          .as("mae"))
      .orderBy("event_type")
  }

  /** STL-LITE DECOMPOSITION of the daily count series per type —
    * trend (centered 7-day moving average), day-of-week seasonal
    * (mean detrended value per dow), residual — reported as the
    * numbers a forecasting triage reads: seasonal AMPLITUDE (how big
    * is the weekly rhythm) and the RESIDUAL VARIANCE SHARE (how much
    * is left after trend+season — the ceiling on any calendar
    * model's accuracy). Exactness: the trend rides micro units via
    * IntegralDivide ((Σ₇·10⁶) div 7 — both engines truncate
    * identically), detrended and seasonal values stay BIGINTs, the
    * two sums of squares ride DECIMAL(38,0), and only the final
    * share is a double. Interior days only (full 7-day windows —
    * edges carry partial MAs on any engine). Same dense zero-filled
    * grid as the forecast family: the windows run over the
    * metadata-sized (types × days) grid, never the raw events.
    */
  def eventsStlDecompose(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val ev = Tables.events(s, dir).select(col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val daily = ev.groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    val meta = ev.agg(min("d").as("lo"), max("d").as("hi"),
      collect_set("event_type").as("tys")).localCheckpoint(true)
    val grid = meta.select(explode(col("tys")).as("event_type"))
      .crossJoin(meta.select(explode(sequence(col("lo"), col("hi")))
        .as("d")))
    val dense = grid.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w7 = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    val interior = dense
      .withColumn("c7", count(lit(1)).over(w7))
      .withColumn("s7", sum("n").over(w7))
      .where(col("c7") === 7)
      .select(col("event_type"), col("d"), col("n"),
        expr("(s7 * 1000000) div 7").as("trend"))
      .withColumn("detr", col("n") * 1000000L - col("trend"))
      .withColumn("dow", pmod(col("d"), lit(7L)))
      .localCheckpoint(true) // seasonal means + residual pass
    val seasonal = interior.groupBy("event_type", "dow")
      .agg(expr("sum(detr) div count(1)").as("sdow"))
    val parts = interior.join(seasonal, Seq("event_type", "dow"))
      .withColumn("resid", col("detr") - col("sdow"))
    val stats = parts.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(expr("n * 1000000")).as("sx"),
        sum(col("resid").cast(dec) * col("resid").cast(dec)).as("sr2"),
        max("sdow").as("smax"), min("sdow").as("smin"))
    val centered = parts.join(
      stats.select(col("event_type"),
        expr("sx div n_days").as("xbar")), "event_type")
      .groupBy("event_type")
      .agg(sum((col("n") * 1000000L - col("xbar")).cast(dec)
        * (col("n") * 1000000L - col("xbar")).cast(dec)).as("sc2"))
    stats.join(centered, "event_type")
      .where(col("n_days") > 7)
      .select(col("event_type"), col("n_days"),
        round((col("smax") - col("smin")).cast("double") / 1e6, 4)
          .as("seasonal_amplitude"),
        when(col("sc2") > 0,
          round(col("sr2").cast("double") / col("sc2").cast("double"), 4))
          .otherwise(lit(null).cast("double")).as("resid_var_share"))
      .orderBy("event_type")
  }

  /** LAG-k AUTOCORRELATION of the daily event-count series per type
    * — the seasonality detector that pairs with the seasonal-naive
    * backtest ([[eventsForecastNaive]]): Pearson r between the
    * zero-filled daily count and its value `lagDays` earlier. r near
    * 1 at lag 7 says "weekly rhythm — the naive forecaster will
    * work"; near 0 says don't bother. Same dense-grid discipline as
    * the backtest (a missing day is a 0 count, never a skipped
    * pair; grid bounds from the data), and r is a pure function of
    * the six exact integer moments over the metadata-sized grid —
    * the numerators ride DECIMAL(38,0) (k·sxy reaches days·counts²,
    * wrapping a BIGINT at ~3·10⁹ events/day) and only the final
    * ratio drops to double, multiplying the two variance factors as
    * doubles inside the sqrt exactly as the oracle does.
    */
  def eventsAutocorr(s: SparkSession, dir: String,
                     lagDays: Int = 7): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val daily = ev.groupBy("event_type", "d")
      .agg(count(lit(1)).as("n"))
    val meta = ev.agg(min("d").as("lo"), max("d").as("hi"),
      collect_set("event_type").as("tys")).localCheckpoint(true)
    val grid = meta.select(explode(col("tys")).as("event_type"))
      .crossJoin(meta.select(explode(sequence(col("lo"), col("hi")))
        .as("d")))
    val dense = grid.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("y"))
    val w = Window.partitionBy("event_type").orderBy("d")
    val dec = "decimal(38,0)"
    def nm(q: org.apache.spark.sql.Column, a: org.apache.spark.sql.Column,
           b: org.apache.spark.sql.Column) =
      (col("k").cast(dec) * q.cast(dec) -
        a.cast(dec) * b.cast(dec)).cast("double")
    dense.withColumn("x", lag("y", lagDays).over(w))
      .where(col("x").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      // guards through the DECIMAL numerators — raw BIGINT k·sxx
      // wraps (or ANSI-throws) where the oracle's HUGEINT keeps going
      .where(nm(col("sxx"), col("sx"), col("sx")) > 0 &&
        nm(col("syy"), col("sy"), col("sy")) > 0)
      .select(col("event_type"), col("k").as("n_days"),
        round(nm(col("sxy"), col("sx"), col("sy"))
          / sqrt(nm(col("sxx"), col("sx"), col("sx"))
            * nm(col("syy"), col("sy"), col("sy"))), 4)
          .as("r_lag"))
      .orderBy("event_type")
  }

  /** CROSS-SERIES CORRELATION MATRIX — pairwise Pearson r between
    * the types' daily count series (the dashboard decoupling
    * detector: clicks and views normally co-move; the day their r
    * drops is the day something broke between them — the
    * cross-series twin of [[eventsAutocorr]]'s self-correlation).
    * Same dense zero-filled grid, pairs by a < b self-join ON DAY
    * (grid-sized, never the raw events), the exact same DECIMAL
    * moment formula — so an autocorr reader audits this one for
    * free. Output the upper triangle, n(n−1)/2 rows.
    */
  def eventsSeriesCorr(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val daily = ev.groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    val meta = ev.agg(min("d").as("lo"), max("d").as("hi"),
      collect_set("event_type").as("tys")).localCheckpoint(true)
    val grid = meta.select(explode(col("tys")).as("event_type"))
      .crossJoin(meta.select(explode(sequence(col("lo"), col("hi")))
        .as("d")))
    val dense = grid.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("v"))
      .localCheckpoint(true) // both sides of the pair join
    val pairs = dense.select(col("event_type").as("type_a"),
        col("d"), col("v").as("x"))
      .join(dense.select(col("event_type").as("type_b"), col("d"),
        col("v").as("y")), "d")
      .where(col("type_a") < col("type_b"))
    val dec = "decimal(38,0)"
    def nm(q: Column, a: Column, b: Column) =
      (col("k").cast(dec) * q.cast(dec) -
        a.cast(dec) * b.cast(dec)).cast("double")
    pairs.groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .where(nm(col("sxx"), col("sx"), col("sx")) > 0 &&
        nm(col("syy"), col("sy"), col("sy")) > 0)
      .select(col("type_a"), col("type_b"), col("k").as("n_days"),
        round(nm(col("sxy"), col("sx"), col("sy"))
          / sqrt(nm(col("sxx"), col("sx"), col("sx"))
            * nm(col("syy"), col("sy"), col("sy"))), 4).as("r"))
      .orderBy("type_a", "type_b")
  }

  /** HERFINDAHL-HIRSCHMAN CONCENTRATION INDEX of supplier revenue
    * per nation — the market-concentration metric (DOJ merger
    * guidelines: HHI > 0.25 = highly concentrated) applied to the
    * supply base: a nation whose parts flow through one dominant
    * supplier is a single point of failure. With shares s_i = c_i/T
    * over exact revenue cents, HHI = Σs_i² = (Σc_i²)/T² — both
    * numerator and T² ride DECIMAL(38,0) (a supplier's squared cents
    * passes 2⁶³ at ~$10⁸ revenue) and one double division ends it.
    * One lineitem scan, supplier-keyed aggregate, nation-keyed
    * rollup of supplier-count-sized partials.
    */
  def supplierHhi(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val rev = Tables.lineitem(s, dir)
      .select(col("l_suppkey"),
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) " +
          "AS BIGINT)").as("cents"))
      .groupBy("l_suppkey").agg(sum("cents").as("c"))
    val bySupp = rev
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(s, dir).select("n_nationkey", "n_name"),
        col("s_nationkey") === col("n_nationkey"))
    bySupp.groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        sum("c").as("total_cents"),
        sum(col("c").cast(dec) * col("c").cast(dec)).as("sumsq"))
      .select(col("n_name"), col("n_suppliers"), col("total_cents"),
        round(col("sumsq").cast("double")
          / (col("total_cents").cast(dec) * col("total_cents").cast(dec))
            .cast("double"), 6).as("hhi"))
      .orderBy("n_name")
  }

  /** ONE-WAY ANOVA across event types — "do the types differ in mean
    * value at all?", the omnibus screen run before any pairwise A/B
    * digging: F = (SSB/(k−1)) / (SSW/(N−k)) with the between/within
    * sums of squares assembled PURELY from per-type sufficient
    * statistics (n, Σx, Σx² in exact micro-cents) —
    * SSB = Σ s_t²/n_t − S²/N and SSW = Σq − Σ s_t²/n_t. The float
    * trap is Σ s_t²/n_t — a sum of DOUBLES whose value depends on
    * fold order, which no oracle reproduces — so each per-type term
    * is micro-quantized to a BIGINT (round(s²/n · 1000)) BEFORE the
    * sum: integer sums are order-free, and every remaining op runs
    * on the 1-row fold (deterministic scalar IEEE). Squared
    * numerators ride DECIMAL(38,0) (s_t² wraps BIGINT at ~$10⁸ per
    * type). One scan, one k-row aggregate, a 1-row fold.
    */
  def eventsAnova(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val g = Tables.events(s, dir)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("m"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("m").as("sx"),
        sum(expr("m * m")).as("q"))
    // rq = round-half-up of (Σm)²·1000/n as PURE INTEGER arithmetic,
    // (2K + n) div (2n) floored: the double path quantized a value
    // past 2^53, where round() reads different bits per engine (r12
    // fuzz seed 3). The scale-6 decimal quotient cannot round across
    // an integer boundary (fractional parts are multiples of 1/(2n),
    // ≥ 5e-5), so floor() is exact; DECIMAL(38,0) holds the result
    // (a BIGINT rq wrapped at the value-domain edge).
    val prepared = g.select(col("n"), col("sx"), col("q"),
      expr("CAST(floor((CAST(sx AS DECIMAL(38,0)) * sx * 2000 + n) " +
        "/ (2 * n)) AS DECIMAL(38,0))").as("rq"))
    prepared
      .agg(count(lit(1)).as("k"), sum("n").as("nn"),
        sum("sx").as("ss"), sum("q").as("qq"),
        sum(col("rq")).as("srq"))
      .where(col("k") > 1 && col("nn") > col("k"))
      .select(col("k").as("n_groups"), col("nn").as("n_obs"),
        round(((col("srq").cast("double") / 1000.0
          - (col("ss").cast(dec) * col("ss").cast(dec)).cast("double")
            / col("nn")) / (col("k") - 1))
          / ((col("qq").cast("double")
            - col("srq").cast("double") / 1000.0)
            / (col("nn") - col("k"))), 4).as("f_stat"))
  }

  /** ORDER INTERARRIVAL DISTRIBUTION per market segment — the
    * recurrence profile (how often customers come back) behind
    * retention and inventory cadence decisions: per customer, the
    * day gaps between consecutive orders (lag over the per-customer
    * date order; same-day ties leave the gap multiset invariant),
    * rolled up per segment as exact-integer count/mean and the exact
    * interpolated median/p95 (`percentile` ≡ quantile_cont, the
    * corpusStats precedent). One orders scan, customer-keyed window,
    * segment aggregate.
    */
  def ordersInterarrival(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey").as("cust"),
      col("o_orderkey"),
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("d"))
    val w = Window.partitionBy("cust").orderBy("d", "o_orderkey")
    val gaps = o.withColumn("gap", col("d") - lag("d", 1).over(w))
      .where(col("gap").isNotNull)
    gaps
      .join(Tables.customer(s, dir)
        .select(col("c_custkey").as("cust"), col("c_mktsegment")), "cust")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap")), 4).as("mean_days"),
        round(expr("percentile(gap, 0.5)"), 4).as("p50_days"),
        round(expr("percentile(gap, 0.95)"), 4).as("p95_days"))
      .orderBy("c_mktsegment")
  }

  /** CHI-SQUARE INDEPENDENCE between order priority and return flag
    * — "do urgent orders return more?", the categorical-association
    * screen (the ANOVA of contingency tables). Observed counts are
    * exact BIGINTs; expected = rowT·colT/N is one double per cell;
    * and the per-cell (o−e)²/e terms MICRO-QUANTIZE to BIGINT before
    * the cross-cell sum (the events_anova discipline — a double sum
    * over cells is fold-order-dependent). Output: cells, dof, χ².
    */
  def priorityReturnsChi2(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val rowT = cells.groupBy("o_orderpriority").agg(sum("o").as("rt"))
    val colT = cells.groupBy("l_returnflag").agg(sum("o").as("ct"))
    val tot = cells.agg(sum("o").as("n"))
    val e = col("rt").cast("double") * col("ct") / col("n")
    val term = expr("CAST(round((o - e) * (o - e) / e * 1000000) " +
      "AS BIGINT)")
    cells.join(rowT, "o_orderpriority").join(colT, "l_returnflag")
      .crossJoin(broadcast(tot))
      .withColumn("e", e)
      .withColumn("t", term)
      .agg(count(lit(1)).as("n_cells"),
        countDistinct("o_orderpriority").as("nr"),
        countDistinct("l_returnflag").as("nc"),
        sum("t").as("st"))
      .select(col("n_cells"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        round(col("st").cast("double") / 1000000.0, 4).as("chi2"))
  }

  /** XYZ DEMAND-VARIABILITY CLASSIFICATION — the inventory-planning
    * companion to ABC (29y): per part, the coefficient of variation
    * of monthly demand (CV = σ/μ over observed months, sample sd),
    * classed X (CV < 0.5, steady — forecast and automate), Y (< 1.0,
    * fluctuating), Z (≥ 1.0, intermittent — safety stock). Quantity
    * moments are exact integers (TPC-H quantities are whole), the
    * variance numerator rides DECIMAL(38,0), and the class cuts
    * compare the UNROUNDED CV (display rounds at 4dp). Parts with a
    * single observed month have no sample variance and are classed Z
    * (nothing to forecast from). One lineitem scan, (part, month) →
    * part aggregates.
    */
  def partXyz(s: SparkSession, dir: String): DataFrame =
    xyzFromMonthly(Tables.lineitem(s, dir)
      .select(col("l_partkey").as("part"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("mx"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
      .groupBy("part", "mx").agg(sum("qty").as("q")))

  /** The XYZ classification from a prepared (part, mx, q) monthly-
    * demand frame — split out (r16) so [[partAbcXyzMatrix]] can feed
    * it from its shared single-scan aggregate while the standalone
    * query keeps its one-scan plan; the moments and cuts are the one
    * definition either way.
    */
  private def xyzFromMonthly(monthly: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val g = monthly.groupBy("part")
      .agg(count(lit(1)).as("n"), sum("q").as("sx"),
        sum(col("q").cast(dec) * col("q").cast(dec)).as("qx"))
    val varNum = (col("n").cast(dec) * col("qx") -
      col("sx").cast(dec) * col("sx").cast(dec)).cast("double")
    val cv = sqrt(varNum / (col("n") * (col("n") - 1)).cast("double"))
      ./(col("sx").cast("double") / col("n"))
    g.select(col("part"), col("n").as("n_months"),
        round(col("sx").cast("double") / col("n"), 4).as("mean_qty"),
        when(col("n") < 2, lit(null).cast("double"))
          .otherwise(round(cv, 4)).as("cv"),
        when(col("n") < 2, lit("Z"))
          .when(cv < 0.5, lit("X"))
          .when(cv < 1.0, lit("Y"))
          .otherwise(lit("Z")).as("xyz"))
      .orderBy("part")
  }

  /** ABC × XYZ PLANNING MATRIX — the classic 9-cell inventory policy
    * grid crossing revenue importance (ABC, [[abcClasses]]) with
    * demand variability (XYZ, [[partXyz]]): AX is automate-and-
    * forecast, CZ is stock-to-order-or-drop, and the cell counts +
    * revenue tell the planner how much of the catalog each policy
    * governs. Pure composition of the two SHARED classifiers (the
    * matrix cannot disagree with either report), one partkey join,
    * one ≤9-key rollup.
    */
  def partAbcXyzMatrix(s: SparkSession, dir: String): DataFrame = {
    // ONE lineitem pass (r16): the ABC revenue and the XYZ monthly
    // demand used to each scan+aggregate lineitem; a shared
    // (part, month) aggregate serves both — revenue re-aggregates the
    // exact month cents (integer addition is associative, so the
    // per-part total is bit-identical), the XYZ moments read the
    // month quantities directly. The checkpoint is catalog×months
    // rows, never lineitem-sized.
    val base = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("part"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("mx"))
      .agg(sum(expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
        .as("cents"),
        sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
      .localCheckpoint(true)
    val rev = base.groupBy(col("part").as("partkey"))
      .agg(sum("cents").as("cents"))
    val (classed, _) = abcClasses(s, rev)
    val xyz = xyzFromMonthly(base.select("part", "mx", "q"))
      .select(col("part").as("partkey"), col("xyz"))
    classed.join(xyz, "partkey")
      .groupBy("abc", "xyz")
      .agg(count(lit(1)).as("n_parts"), sum("cents").as("sc"))
      .select(col("abc"), col("xyz"), col("n_parts"),
        round(col("sc").cast("double") / 100.0, 2).as("revenue"))
      .orderBy("abc", "xyz")
  }

  /** PRICE ELASTICITY per brand — the econometric classic (log-log
    * OLS: ε = d ln q / d ln p) over order lines, unit price =
    * extendedprice/quantity: ε ≈ −1 means revenue-neutral pricing,
    * |ε| > 1 elastic demand. The float discipline is the zipfFit
    * precedent verbatim: both logs MICRO-QUANTIZE to BIGINTs
    * (round(ln·10⁶)) before the moment sums, so the per-brand slope
    * is a ratio of exact integers — the only cross-engine float
    * surface is ln itself on IDENTICAL double inputs (the division
    * is one IEEE op on the same parquet doubles). One
    * lineitem⋈part pass, brand-keyed moment aggregate; thin brands
    * (n < 30) filtered — a 2-point "elasticity" is noise.
    */
  def priceElasticity(s: SparkSession, dir: String,
                      minN: Long = 30L): DataFrame = {
    // non-positive qty/price rows carry NULL moments (a log-log model
    // has no reading for them) — the guard also keeps any plan order
    // from pushing ln(0)/NaN into the ANSI cast (r12 fuzz)
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"),
        expr("CASE WHEN l_quantity > 0 AND l_extendedprice > 0 THEN " +
          "CAST(round(ln(l_extendedprice / l_quantity) * 1000000) " +
          "AS BIGINT) END").as("x"),
        expr("CASE WHEN l_quantity > 0 THEN " +
          "CAST(round(ln(l_quantity) * 1000000) AS BIGINT) END").as("y"))
    val dec = "decimal(38,0)"
    def nm(q: Column, a: Column, b: Column) =
      (col("n").cast(dec) * q.cast(dec) -
        a.cast(dec) * b.cast(dec)).cast("double")
    li.join(Tables.part(s, dir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      // the guard must ride the DECIMAL numerator too: n·sxx in raw
      // BIGINT overflows ANSI Spark at ~2400 rows/brand (x ~ 10⁷)
      .where(col("n") >= minN &&
        nm(col("sxx"), col("sx"), col("sx")) =!= 0.0)
      .select(col("p_brand"), col("n").as("n_obs"),
        round(nm(col("sxy"), col("sx"), col("sy"))
          / nm(col("sxx"), col("sx"), col("sx")), 4).as("elasticity"))
      .orderBy("p_brand")
  }

  /** GINI COEFFICIENT of customer spend — the inequality measure
    * every revenue-concentration review wants beside the ABC/Pareto
    * cuts: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending spend
    * with 1-based global rank i. The scale hazard is the GLOBAL
    * VALUE-ORDERED RANK — a naive window is a single-partition
    * corpus sort — so the rank decomposes through the repo's
    * two-level pattern (corpus_budget_select / export_shards): a
    * monotone VALUE BAND keys the within-band window, the ≤B per-band
    * (count, Σx) totals prefix-sum on the driver, and
    * Σ i·x = Σ_bands [base_count·Σx(band) + Σ i_w·x] reassembles the
    * global moment exactly — band boundaries are value-monotone so
    * band-major order IS the global order, and ties (equal x) are
    * rank-order-invariant in i·x. Rank-weighted products ride
    * DECIMAL(38,0) (i·x reaches n·maxspend — past 2⁶³ at warehouse
    * scale); the mirror collapses to the textbook one-window form
    * because the decomposition is exact. One orders scan, one
    * cust aggregate, B-sized driver state.
    */
  def customerGini(s: SparkSession, dir: String,
                   bands: Int = 32): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val sp = Tables.orders(s, dir)
      .select(col("o_custkey").as("cust"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
      .groupBy("cust").agg(sum("v").as("c"))
      .localCheckpoint(true)
    val bounds = sp.agg(min("c").as("lo"), max("c").as("hi"))
    val banded = sp.crossJoin(broadcast(bounds))
      .select(col("cust"), col("c"),
        expr(s"least((c - lo) * $bands div (hi - lo + 1), " +
          s"${bands - 1})").as("band"))
    val w = Window.partitionBy("band").orderBy(col("c"), col("cust"))
    val bandAgg = banded
      .withColumn("iw", row_number().over(w).cast("long"))
      .groupBy("band")
      .agg(count(lit(1)).as("cnt"), sum("c").as("sx"),
        sum(col("iw").cast(dec) * col("c").cast(dec)).as("sixw"))
      .localCheckpoint(true)
    // ≤B-row driver prefix of band counts → global rank bases
    val bandRows = bandAgg.select("band", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = bandRows.map { case (b, n) =>
      val r = (b, acc); acc += n; r
    }.toSeq
    val baseDf = bases.toDF("band", "base")
    bandAgg.join(broadcast(baseDf), "band")
      .select((col("base").cast(dec) * col("sx").cast(dec)
        + col("sixw")).as("t"), col("cnt"), col("sx"))
      .agg(sum("t").as("sixx"), sum("cnt").as("n"), sum("sx").as("tot"))
      .select(col("n").as("n_customers"), col("tot").as("total_cents"),
        round((lit(2) * col("sixx")
          - (col("n") + 1).cast(dec) * col("tot").cast(dec))
          .cast("double")
          / (col("n").cast(dec) * col("tot").cast(dec)).cast("double"), 6)
          .as("gini"))
  }

  /** Benford first-digit probabilities log10(1 + 1/d), fixed at 6dp
    * so the Spark literal and the interpolated oracle literal are
    * the same number by construction.
    */
  val benfordP: Seq[(Long, Double)] =
    (1 to 9).map(d => d.toLong ->
      BigDecimal(math.log10(1 + 1.0 / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** BENFORD FIRST-DIGIT AUDIT over event values — the classic
    * fabricated-data detector (Benford 1938; fraud analytics'
    * first screen): organically-generated magnitudes put digit d
    * first with probability log10(1+1/d); synthetic or clamped
    * values don't. Per digit: exact count, observed share, the
    * Benford expectation (a 6dp literal shared with the oracle),
    * and the signed excess. The digit is a substring of the exact
    * integer micro-cents — no float log in the row path, one scan,
    * a 9-row aggregate.
    */
  /** The leading-digit projection — stateless, so it runs unchanged
    * over a batch frame or a stream (the streaming twin's input leg;
    * one definition, the two cannot drift). Input needs `value`.
    */
  def benfordDigits(events: DataFrame): DataFrame =
    events.select(expr("CAST(round(value * 100) AS BIGINT)").as("mc"))
      .where(col("mc") > 0)
      .select(substring(col("mc").cast("string"), 1, 1).cast("long")
        .as("digit"))

  def eventsBenford(s: SparkSession, dir: String): DataFrame = {
    val pCol = benfordP.foldLeft(lit(null).cast("double")) {
      case (acc, (d, p)) => when(col("digit") === d, lit(p)).otherwise(acc)
    }
    // total folds from the 9-row digit aggregate, not a second
    // events scan (ScanAudit r11)
    val cnt = benfordDigits(Tables.events(s, dir))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      .localCheckpoint(true)
    val tot = cnt.agg(sum("n_obs").as("total"))
    cnt
      .crossJoin(broadcast(tot))
      .withColumn("p", pCol)
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") / col("total"), 4).as("share"),
        col("p").as("benford_p"),
        round(col("n_obs").cast("double") / col("total") - col("p"), 4)
          .as("excess"))
      .orderBy("digit")
  }

  /** MARKET-BASKET pair mining over customer baskets (the parts a
    * customer has ever ordered): frequent co-purchased part pairs
    * ranked by LIFT — the apriori shape at warehouse scale. The
    * 100-TB discipline is the two-stage prune: item supports first
    * (one aggregate), only FREQUENT items (support ≥ minItemSup)
    * enter the pair stage, and pair expansion is an equi-join on the
    * basket key — per-basket work is bounded by the frequent-item
    * count in that basket, never the catalog. A whale basket (a
    * reseller/bot account holding 10⁴+ frequent parts) would still
    * make one cust key fan out quadratically, so each basket keeps
    * only its top-`capPerCust` frequent items (highest support,
    * part-id tiebreak — the items that can reach minPairSup at all
    * are the high-support ones, so the cap discards the least likely
    * pair candidates first) before the self-join: per-key fan-out is
    * ≤ C·(C−1)/2 regardless of basket size. Counts are exact
    * BIGINTs; lift/confidence are single divisions from identical
    * integers, so the top-20 cut is tie-stable.
    */
  /** The whale-basket guard shared by [[basketPairs]] and
    * [[partItemCf]]: per customer, keep only the top-`capPerCust`
    * frequent items (highest support first, part-id tiebreak) before
    * any pair self-join — one cust key's fan-out is then ≤ C·(C−1)/2
    * pairs no matter how many parts the basket holds (SkewSpec pins
    * a planted 10⁴-part whale). `freq` carries (part, n).
    */
  private[graft] def capFrequentPerBasket(baskets: DataFrame,
                                          freq: DataFrame,
                                          capPerCust: Int): DataFrame = {
    val wc = Window.partitionBy("cust").orderBy(col("n").desc, col("part"))
    baskets.join(freq, "part")
      .withColumn("crk", row_number().over(wc))
      .where(col("crk") <= capPerCust)
      .select("cust", "part")
  }

  /** The (baskets, supports, support-filtered pair counts) triple
    * behind the basket family — memoized per (dir, params): both
    * `basket_pairs` and `part_item_cf` consume the identical
    * expansion, so in one session (the bench, a notebook) it builds
    * once. Deterministic, checkpointed — the ByproductCache
    * contract.
    */
  private[graft] def basketPairCounts(s: SparkSession, dir: String,
                                      minItemSup: Long, minPairSup: Long,
                                      capPerCust: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val baskets = graft.ByproductCache.getOrCompute(
      s.sparkContext.applicationId, s"baskets|$dir") {
      Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .distinct()
        .localCheckpoint(true)
    }
    val sup = graft.ByproductCache.getOrCompute(
      s.sparkContext.applicationId, s"basketsup|$dir") {
      baskets.groupBy("part").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
    }
    val pairs = graft.ByproductCache.getOrCompute(
      s.sparkContext.applicationId,
      s"basketpairs|$dir|$minItemSup|$minPairSup|$capPerCust") {
      val freq = sup.where(col("n") >= minItemSup)
      val fb = capFrequentPerBasket(baskets, freq, capPerCust)
      fb.as("a")
        .join(fb.as("b"),
          col("a.cust") === col("b.cust") && col("a.part") < col("b.part"))
        .groupBy(col("a.part").as("part_a"), col("b.part").as("part_b"))
        .agg(count(lit(1)).as("n_both"))
        .where(col("n_both") >= minPairSup)
        .localCheckpoint(true)
    }
    (baskets, sup, pairs)
  }

  def basketPairs(s: SparkSession, dir: String, minItemSup: Long = 20L,
                  minPairSup: Long = 5L, topN: Int = 20,
                  capPerCust: Int = 64): DataFrame = {
    val (baskets, sup, pairs) =
      basketPairCounts(s, dir, minItemSup, minPairSup, capPerCust)
    val nBaskets = baskets.select("cust").distinct()
      .agg(count(lit(1)).as("nb"))
    pairs
      .join(sup.select(col("part").as("part_a"), col("n").as("n_a")),
        "part_a")
      .join(sup.select(col("part").as("part_b"), col("n").as("n_b")),
        "part_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("part_a"), col("part_b"), col("n_both"),
        round(col("n_both").cast("double") * col("nb")
          / (col("n_a").cast("double") * col("n_b")), 4).as("lift"),
        round(col("n_both").cast("double") / col("n_a"), 4).as("conf_ab"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(topN)
  }

  /** ITEM-ITEM COLLABORATIVE FILTERING — the recommendation artifact
    * the association table (basket_pairs) feeds: per part, the top-3
    * most similar parts by co-occurrence COSINE n_both/√(n_a·n_b)
    * over customer baskets — "customers who bought X also bought Y",
    * the Amazon item-to-item shape (Linden et al. 2003). Same
    * support-filtered, cust-keyed blocked pair expansion as
    * basket_pairs — including its per-customer top-`capPerCust`
    * frequent-item cap, which bounds any one cust key's fan-out at
    * C·(C−1)/2 pairs even for whale baskets; similarity from exact
    * integer counts (sqrt and
    * one division are correctly-rounded IEEE ops — identical doubles
    * on both engines), RANKED ON THE 4dp-ROUNDED score with
    * neighbor-id tiebreak (the BM25 ranking discipline). The rank
    * window runs over the support-filtered pair table, never the
    * corpus; pairs materialize once and serve both directions.
    */
  def partItemCf(s: SparkSession, dir: String, minItemSup: Long = 20L,
                 minPairSup: Long = 5L, k: Int = 3,
                 capPerCust: Int = 64): DataFrame = {
    val (_, sup, pairs) =
      basketPairCounts(s, dir, minItemSup, minPairSup, capPerCust)
    val sym = pairs.select(col("part_a").as("part"),
        col("part_b").as("nbr"), col("n_both"))
      .unionByName(pairs.select(col("part_b").as("part"),
        col("part_a").as("nbr"), col("n_both")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy(col("score").desc, col("nbr"))
    sym
      .join(sup.select(col("part"), col("n").as("n_part")), "part")
      .join(sup.select(col("part").as("nbr"), col("n").as("n_nbr")), "nbr")
      .select(col("part"), col("nbr"), col("n_both"),
        round(col("n_both").cast("double")
          / sqrt(col("n_part").cast("double") * col("n_nbr")), 4)
          .as("score"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("part", "rk", "nbr", "n_both", "score")
      .orderBy("part", "rk")
  }

  /** PER-GROUP TREND DETECTION — distributed OLS from exact moments:
    * monthly revenue per part, slope fitted per part from the five
    * integer moments (n, Σx, Σy, Σxy, Σx²) with x = months since
    * epoch and y = revenue cents — the regression-per-group
    * primitive (price trends, demand drift, KPI monitoring) done the
    * scalable way: one (part, month) aggregate, one per-part moment
    * fold, the closed-form slope at the end. Every moment is a Long
    * (headroom: Σxy ≲ months·mx·cents ≈ 10¹⁵ at warehouse scale),
    * so slope = (nΣxy−ΣxΣy)/(nΣxx−Σx²) is a pure function of exact
    * integers — identical doubles both engines, and the top-20
    * cutoff ranks on it with part tiebreak. No windows, no driver
    * state; output is top-N-sized.
    */
  def partTrendSlope(s: SparkSession, dir: String, minMonths: Long = 6L,
                     topN: Int = 20): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_partkey").as("part"),
      (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
        .cast("long").as("mx"),
      expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
        .as("cents"))
    val monthly = li.groupBy("part", "mx").agg(sum("cents").as("y"))
    val ag = monthly.groupBy("part").agg(
        count(lit(1)).as("nm"), sum("mx").as("sx"), sum("y").as("sy"),
        sum(col("mx") * col("y")).as("sxy"),
        sum(col("mx") * col("mx")).as("sxx"))
      .where(col("nm") >= minMonths)
    ag.select(col("part"), col("nm"), col("sy"),
        ((col("nm") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("nm") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("sl"))
      .orderBy(col("sl").desc, col("part")).limit(topN)
      .select(col("part"), col("nm").as("n_months"),
        round(col("sy").cast("double") / col("nm") / 100, 4).as("mean_rev"),
        round(col("sl") / 100, 4).as("slope"))
      .orderBy(col("slope").desc, col("part"))
  }

  /** DAY-OF-WEEK SEASONALITY INDEX — the multiplicative seasonal
    * factor per (event type, ISO weekday) that the seasonal-naive
    * forecast (events_forecast_naive) implicitly assumes and a
    * deseasonalizing pipeline divides out: index = mean(count on
    * that dow) / mean(count overall), both means single divisions of
    * exact integer daily counts over the dense zero-filled grid (a
    * missing day is a 0, not a skipped observation — the
    * forecast-naive rule), bounds from the data. One scan → (type,
    * day) aggregate; everything after is metadata-sized.
    */
  def eventsDowSeasonality(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val daily = ev.groupBy("event_type", "d")
      .agg(count(lit(1)).as("n"))
    val meta = ev.agg(min("d").as("lo"), max("d").as("hi"),
      collect_set("event_type").as("tys")).localCheckpoint(true)
    val grid = meta.select(explode(col("tys")).as("event_type"))
      .crossJoin(meta.select(explode(sequence(col("lo"), col("hi")))
        .as("d")))
    val dense = grid.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"))
      // ISO weekday from the epoch-day index: day 0 (1970-01-01) was
      // a Thursday = 4; pure integer arithmetic on both engines
      .withColumn("dow", (col("d") + 3) % 7 + 1)
      .localCheckpoint(true)
    val tot = dense.groupBy("event_type")
      .agg(sum("n").as("st"), count(lit(1)).as("nd"))
    dense.groupBy("event_type", "dow")
      .agg(sum("n").as("sd"), count(lit(1)).as("ndw"))
      .join(broadcast(tot), "event_type")
      .select(col("event_type"), col("dow"),
        round(col("sd").cast("double") / col("ndw"), 4).as("dow_mean"),
        round((col("sd").cast("double") / col("ndw"))
          / (col("st").cast("double") / col("nd")), 4)
          .as("seasonal_index"))
      .orderBy("event_type", "dow")
  }

  /** COHORT LTV TRIANGLE — the lifetime-value table every growth
    * dashboard draws (cohort = WEEK of a user's first event — the
    * fixture spans one month, so weekly cohorts give the triangle
    * real cells; a production run swaps the week index for a month
    * index, same plan): per (cohort_week, k) the cohort's purchase
    * value and the running cumulative average per cohort user — the
    * curve whose plateau IS the LTV estimate. Exact integer cents
    * per cell (the money rule); cohort sizes broadcast; the
    * cumulative window runs over each cohort's ≤ weeks-span frame
    * (metadata-sized). Week index = epoch-day div 7 — pure integer
    * arithmetic on both engines. One scan for first-events
    * (user-keyed, loader exchange), one for spend.
    */
  def customerCohortLtv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val weekIdx = (datediff(col("ts").cast("date"),
      lit("1970-01-01").cast("date")).cast("long") / 7).cast("long")
    val firstEv = ev.groupBy("user_id")
      .agg(min(weekIdx).as("cohort"))
    val spend = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), weekIdx.as("m"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .join(firstEv, "user_id")
      .groupBy(col("cohort"), (col("m") - col("cohort")).as("k"))
      .agg(sum("cents").as("sc"), count(lit(1)).as("n_purchases"))
    val sizes = broadcast(firstEv.groupBy("cohort")
      .agg(count(lit(1)).as("n_users")))
    val w = Window.partitionBy("cohort").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spend.join(sizes, "cohort")
      .withColumn("cum", sum("sc").over(w))
      .select(col("cohort"), col("k"), col("n_users"),
        col("n_purchases"),
        round(col("sc").cast("double") / col("n_users") / lit(100.0), 4)
          .as("avg_spend"),
        round(col("cum").cast("double") / col("n_users") / lit(100.0), 4)
          .as("cum_ltv"))
      .orderBy("cohort", "k")
  }

  /** ABC ANALYSIS — the classic inventory/revenue classification
    * (A: parts carrying the first 80% of revenue, B: to 95%, C: the
    * tail): per-part revenue in EXACT integer cents (round per row,
    * then a long sum — the customer_rfm money rule), global
    * revenue-descending rank and running sum via the two-level
    * decomposition (monotone floor-log2 revenue bands key the
    * within-band windows; band totals prefix-sum on the driver — no
    * single-partition corpus sort), and the 80/95 cuts decided in
    * EXACT integer arithmetic (cum·5 ≤ total·4, cum·20 ≤ total·19 —
    * no float share ever classifies a part). Output is the 3-row
    * class summary.
    */
  /** ABC class per part from a (partkey, cents) revenue frame — the
    * two-level banded global rank partAbcAnalysis pioneered, shared
    * with [[partAbcMigration]] so the classification and its drift
    * report cannot disagree. Returns ((partkey, cents, abc), total).
    */
  private def abcClasses(s: SparkSession,
                         rev0: DataFrame): (DataFrame, Long) = {
    import s.implicits._
    val rev = rev0.where(col("cents") > 0)
      // monotone band: higher revenue → lower band id, so band order
      // IS the global revenue-descending order across bands
      .withColumn("bk", -(length(bin(col("cents"))) - 1).cast("long"))
      .localCheckpoint(true)
    val w = Window.partitionBy("bk")
      .orderBy(col("cents").desc, col("partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = rev.withColumn("cum_in", sum("cents").over(w))
    val bandTotals = rev.groupBy("bk").agg(sum("cents").as("t"))
      .orderBy("bk").collect()
    var acc = 0L
    val bases = bandTotals.map { r =>
      val base = (r.getLong(0), acc); acc += r.getLong(1); base
    }
    val total = acc
    val baseDf = broadcast(bases.toSeq.toDF("bk", "base"))
    val classed = within.join(baseDf, "bk")
      .withColumn("cum", col("base") + col("cum_in"))
      .withColumn("abc",
        when(col("cum") * 5 <= lit(total) * 4, "A")
          .when(col("cum") * 20 <= lit(total) * 19, "B")
          .otherwise("C"))
      .select("partkey", "cents", "abc")
    (classed, total)
  }

  def partAbcAnalysis(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
        .as("cents"))
    val (classed, total) = abcClasses(s, rev)
    classed
      .groupBy("abc")
      .agg(count(lit(1)).as("n_parts"), sum("cents").as("sc"))
      .select(col("abc"), col("n_parts"),
        round(col("sc").cast("double") / 100.0, 2).as("revenue"),
        round(col("sc").cast("double") / lit(total.toDouble), 4)
          .as("rev_share"))
      .orderBy("abc")
  }

  /** ANOMALY CONSENSUS — ensemble voting across the three detectors
    * (global z, robust MAD z, online expanding z): alert only when
    * ≥ 2 agree — the standard alert-fatigue reducer (each detector
    * has a failure mode: global z is wrecked by the outliers it
    * hunts, MAD goes blind when half the days are weird, online is
    * late early in the series; their INTERSECTION is what a human
    * would page on). Pure composition of the three shipped plans
    * (full-outer on (type, day), vote = presence), so the consensus
    * cannot disagree with its members. Flagged-day-sized work past
    * the member plans.
    */
  def eventsAnomalyConsensus(s: SparkSession, dir: String): DataFrame = {
    val z = eventsAnomaly(s, dir)
      .select(col("event_type"), col("day"), lit(1L).as("vz"))
    val m = eventsAnomalyMad(s, dir)
      .select(col("event_type"), col("day"), lit(1L).as("vm"))
    val o = eventsAnomalyOnline(s, dir)
      .select(col("event_type"), col("day"), lit(1L).as("vo"))
    z.join(m, Seq("event_type", "day"), "full_outer")
      .join(o, Seq("event_type", "day"), "full_outer")
      .select(col("event_type"), col("day"),
        (coalesce(col("vz"), lit(0L)) + coalesce(col("vm"), lit(0L))
          + coalesce(col("vo"), lit(0L))).as("votes"))
      .where(col("votes") >= 2)
      .orderBy("event_type", "day")
  }

  /** METRIC-ABSENCE ALERT — "this metric went SILENT" detection, the
    * alerting class the anomaly family (z/MAD/online/changepoint)
    * misses because silence produces no rows to score: per type over
    * the dense zero-filled grid, the trailing silent-day run vs the
    * LONGEST internal silence the metric ever had — alert fires when
    * the current quiet streak exceeds its own history (a
    * self-calibrating threshold, no magic constant). Zero-runs via
    * gaps-and-islands (pure integers); a run is trailing iff it
    * touches the grid's last day. One events scan; everything
    * downstream is grid-sized.
    */
  def eventsAbsenceAlert(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir).select(col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val daily = ev.groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    val meta = ev.agg(min("d").as("lo"), max("d").as("hi"),
      collect_set("event_type").as("tys")).localCheckpoint(true)
    val grid = meta.select(explode(col("tys")).as("event_type"))
      .crossJoin(meta.select(explode(sequence(col("lo"), col("hi")))
        .as("d"), col("hi")))
    val dense = grid.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"), col("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("d")
    val runs = dense.where(col("n") === 0)
      .withColumn("grp", col("d") - row_number().over(w))
      .groupBy("event_type", "grp")
      .agg(count(lit(1)).as("len"), max("d").as("run_end"),
        max("hi").as("hi"))
    val perType = runs.groupBy("event_type")
      .agg(sum(when(col("run_end") === col("hi"), col("len"))
          .otherwise(0L)).as("trailing_silent"),
        max(when(col("run_end") < col("hi"), col("len"))
          .otherwise(0L)).as("max_internal_gap"))
    meta.select(explode(col("tys")).as("event_type"))
      .join(perType, Seq("event_type"), "left")
      .select(col("event_type"),
        coalesce(col("trailing_silent"), lit(0L)).as("trailing_silent"),
        coalesce(col("max_internal_gap"), lit(0L)).as("max_internal_gap"),
        (coalesce(col("trailing_silent"), lit(0L)) >
          coalesce(col("max_internal_gap"), lit(0L))).as("alert"))
      .orderBy("event_type")
  }

  /** SOURCING-BREADTH EXPOSURE — revenue bucketed by how many
    * suppliers actually ship each part (the supply-resilience screen
    * beside [[supplierHhi]]'s concentration view: HHI says one
    * supplier DOMINATES a nation; this says how THIN each slice of
    * revenue's supplier base is): per part, distinct shipping
    * suppliers → thin (<20) / moderate / broad (≥30) buckets — cuts
    * calibrated to the fixture's observed 13..41 range so the report
    * discriminates — with part counts, revenue, and each bucket's
    * revenue share. Exact distinct counts and cents sums; one
    * lineitem pass, one part aggregate, one 3-key rollup with a
    * broadcast total.
    */
  def partSourcingRisk(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("partkey"))
      .agg(countDistinct("l_suppkey").as("n_suppliers"),
        sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) " +
          "AS BIGINT)")).as("cents"))
      .withColumn("bucket",
        when(col("n_suppliers") < 20, "1_thin")
          .when(col("n_suppliers") < 30, "2_moderate")
          .otherwise("3_broad"))
    val tot = per.agg(sum("cents").as("total"))
    per.groupBy("bucket")
      .agg(count(lit(1)).as("n_parts"), sum("cents").as("sc"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_parts"),
        round(col("sc").cast("double") / 100.0, 2).as("revenue"),
        round(col("sc").cast("double") / col("total").cast("double"), 4)
          .as("rev_share"))
      .orderBy("bucket")
  }

  /** ABC CLASS MIGRATION — the classification-drift matrix between
    * the two order-date halves (the inventory-planning review that
    * catches a stable-looking ABC report hiding heavy churn
    * underneath: a part that was A and is now C ties up exactly the
    * safety stock the report says it deserves): per part, ABC class
    * in each period via the SHARED [[abcClasses]] machinery (the
    * report and its drift audit cannot disagree), parts trading in
    * only one period carry the '-' class on the silent side. Output
    * is the (from, to) transition matrix with counts — at most 16
    * rows whatever the catalog size. Two classed frames (each the
    * proven two-level banded rank), one full-outer join on partkey,
    * one 16-key aggregate.
    */
  def partAbcMigration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"),
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) " +
          "AS BIGINT)").as("cents"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("d")),
        col("l_orderkey") === col("o_orderkey"))
    val bounds = li.agg(expr("(min(d) + max(d)) div 2").as("mid"))
    val tagged = li.crossJoin(broadcast(bounds)).localCheckpoint(true)
    // ONE banded classification pass for BOTH halves (r16; was two
    // full abcClasses chains — two aggregates over tagged, two
    // checkpoints, two band-total collects, two windows). Keying
    // every [[abcClasses]] step by the half ('post') reproduces each
    // half's classes bit-for-bit: band ids are per-row, the window
    // partitioned by (post, bk) ranks exactly the rows the per-half
    // window ranked in the same order, and the per-(post, bk) bases /
    // per-post totals are the same partial sums the per-half driver
    // loop accumulated (AnalyticsSpec pins equality with the two-pass
    // composition). The final (from, to) pivot folds the old
    // full-outer join into one partkey aggregate — a part silent in a
    // half has no classed row there, so its max(when) leg is NULL and
    // coalesces to '-', exactly the old join's semantics.
    val rev = tagged
      .groupBy((col("d") >= col("mid")).as("post"),
        col("l_partkey").as("partkey"))
      .agg(sum("cents").as("cents"))
      .where(col("cents") > 0)
      .withColumn("bk", -(length(bin(col("cents"))) - 1).cast("long"))
      .localCheckpoint(true)
    val w = Window.partitionBy("post", "bk")
      .orderBy(col("cents").desc, col("partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = rev.withColumn("cum_in", sum("cents").over(w))
    val bandTotals = rev.groupBy("post", "bk").agg(sum("cents").as("t"))
      .orderBy("post", "bk").collect()
    val bases = bandTotals.groupBy(_.getBoolean(0)).toSeq.flatMap {
      case (post, rows) =>
        var acc = 0L
        val withBase = rows.sortBy(_.getLong(1)).map { r =>
          val b = (post, r.getLong(1), acc); acc += r.getLong(2); b
        }
        val total = acc
        withBase.map { case (p, bk, base) => (p, bk, base, total) }
    }
    val baseDf = broadcast(bases.toDF("post", "bk", "base", "total"))
    val classed = within.join(baseDf, Seq("post", "bk"))
      .withColumn("cum", col("base") + col("cum_in"))
      .withColumn("abc",
        when(col("cum") * 5 <= col("total") * 4, "A")
          .when(col("cum") * 20 <= col("total") * 19, "B")
          .otherwise("C"))
    classed.groupBy("partkey")
      .agg(max(when(!col("post"), col("abc"))).as("a0"),
        max(when(col("post"), col("abc"))).as("a1"))
      .select(coalesce(col("a0"), lit("-")).as("class_from"),
        coalesce(col("a1"), lit("-")).as("class_to"))
      .groupBy("class_from", "class_to")
      .agg(count(lit(1)).as("n_parts"))
      .orderBy("class_from", "class_to")
  }

  /** OPEN-ORDER BACKLOG time series — the fulfillment-pipeline
    * depth chart (orders placed but not yet fully shipped, per day):
    * backlog(d) = Σ placed ≤ d − Σ fully-shipped ≤ d over the dense
    * day grid, where an order ships when its LAST lineitem does
    * (max l_shipdate per order). Both running sums use the
    * export_shards TWO-LEVEL decomposition — within-band window
    * cumsums + band totals prefix-summed on the driver (bands are
    * day div 512: a metadata-sized handful) — keeping the repo's
    * no-single-partition-running-sum rule intact even though a day
    * grid would tolerate one. Heavy work is two keyed aggregates
    * (orders by day, lineitem by order then day); the grid math is
    * days-sized.
    */
  def ordersBacklog(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val epoch = lit("1970-01-01").cast("date")
    val placed = Tables.orders(s, dir)
      .select(datediff(col("o_orderdate").cast("date"), epoch)
        .cast("long").as("d"))
      .groupBy("d").agg(count(lit(1)).as("np"))
    val shipped = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate").cast("date")).as("sd"))
      .select(datediff(col("sd"), epoch).cast("long").as("d"))
      .groupBy("d").agg(count(lit(1)).as("ns"))
    val bounds = placed.select("d").unionByName(shipped.select("d"))
      .agg(min("d").as("lo"), max("d").as("hi"))
    val grid = bounds.select(explode(sequence(col("lo"), col("hi")))
      .as("d"))
    val daily = grid.join(placed, Seq("d"), "left")
      .join(shipped, Seq("d"), "left")
      .select(col("d"), coalesce(col("np"), lit(0L)).as("np"),
        coalesce(col("ns"), lit(0L)).as("ns"))
      .withColumn("bk", expr("d div 512"))
      .localCheckpoint(true)
    val w = Window.partitionBy("bk").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = daily.withColumn("cp_in", sum("np").over(w))
      .withColumn("cs_in", sum("ns").over(w))
    val bandTotals = daily.groupBy("bk")
      .agg(sum("np").as("tp"), sum("ns").as("ts"))
      .orderBy("bk").collect()
    var accP = 0L
    var accS = 0L
    val bases = bandTotals.map { r =>
      val base = (r.getLong(0), accP, accS)
      accP += r.getLong(1); accS += r.getLong(2)
      base
    }
    val baseDf = broadcast(bases.toSeq.toDF("bk", "bp", "bs"))
    within.join(baseDf, "bk")
      .select(col("d").as("day"), col("np").as("n_placed"),
        col("ns").as("n_shipped"),
        (col("bp") + col("cp_in") - (col("bs") + col("cs_in")))
          .as("backlog"))
      .orderBy("day")
  }

  /** A/B POWER ANALYSIS — the sample-size calculator an
    * experimentation platform runs BEFORE launching (events_ab_test
    * reads the result after): per event type, n per arm to detect a
    * 5% lift of the mean at α=0.05 two-sided, power 0.8 —
    * n = 2σ²(z_{α/2}+z_β)²/δ². Every input derives from exact
    * integer moments (n, Σx, Σx² in cents — the events_ab_test
    * rule), the z constants are plain double literals on both
    * engines (the supplier_wilson DOUBLE-forcing lesson), so the
    * doubles — and hence the ceil'd sample sizes — are
    * bit-identical. One scan, one per-type aggregate.
    */
  def eventsPowerAnalysis(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(s, dir)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("m"))
      .groupBy("event_type")
      // the SQUARE must already live in DECIMAL(38,0): a BIGINT m·m
      // wraps (ANSI: throws) at |value| ≥ ~9.6e7 — the same headroom
      // rule the numerator below follows (surfaced by the r12 fuzz's
      // planted 1e9 value)
      .agg(count(lit(1)).as("n"), sum("m").as("sx"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("qx"))
      .where(col("n") > 1)
    val mean = col("sx").cast("double") / col("n") / lit(100.0)
    // DECIMAL(38,0) numerator — same overflow-headroom discipline as
    // eventsAbSequential/dimVariance (BIGINT n·qx wraps at ~3·10⁵
    // events per type; decimal stays exact to 10³⁸)
    val dec = "decimal(38,0)"
    val vr = (col("n").cast(dec) * col("qx").cast(dec) -
      col("sx").cast(dec) * col("sx").cast(dec)).cast("double") /
      (col("n") * (col("n") - 1)).cast("double") / lit(10000.0)
    val delta = mean * lit(0.05)
    val zs = lit(1.96) + lit(0.8416)
    // REPORTED variance rounds in EXACT integer arithmetic (r14,
    // fuzz seed 1414): vr's true value N/D (N = n·qx − sx², D =
    // n(n−1)·10⁴, both exact) can land on a .XXXX5 shortest-decimal
    // boundary where Spark's HALF_UP and DuckDB's binary round
    // split (the seed-505 class). floor((2N·10⁴ + D)/(2D)) is the
    // exact half-up (N ≥ 0); all DECIMAL(38,0) — headroom to 10³⁸
    // vs the ~4·10³⁰ worst term. The UNROUNDED vr still feeds
    // n_per_arm, as before.
    val num = col("n").cast(dec) * col("qx").cast(dec) -
      col("sx").cast(dec) * col("sx").cast(dec)
    val den = col("n").cast(dec) * (col("n") - 1).cast(dec) *
      lit(10000).cast(dec)
    g.withColumn("vnum", num).withColumn("vden", den)
      .select(col("event_type"), col("n").as("n_obs"),
        round(mean, 4).as("mean_value"),
        (expr("(vnum * 20000 + vden) div (vden * 2)").cast("double")
          / 10000.0).as("variance"),
        round(delta, 4).as("mde"),
        ceil(lit(2.0) * vr * zs * zs / (delta * delta)).cast("long")
          .as("n_per_arm"))
      .orderBy("event_type")
  }

  /** ROLLING-WINDOW PERCENTILE from ADDITIVE HISTOGRAMS — trailing
    * 7-day p95 of event value per type, the latency/spend dashboard
    * line every ops page draws. The naive form re-sorts each
    * window's events (days × window-events log-sort); here the
    * histogram sketch's MERGEABILITY does the windowing: bin counts
    * add, so each event row is charged to the ≤ 7 trailing windows
    * it serves (a map-local explode — the ONE aggregation behind it
    * map-side-combines to ≤ types×days×bins rows per partition
    * before the exchange, so the shuffle never carries event rows)
    * and each (type, day) finalizes its p95 from ≤ bins rows — the
    * sketch_hist_quantile ceil-rank + in-bin interpolation, exact
    * integer ranks, one float division. ONE aggregation total is
    * also what makes the state STREAMABLE (chained stateful
    * aggregations don't stream; this one folds additively —
    * RollingP95 twin in SketchStreamSpec).
    */
  /** The rolling histogram STATE — per (type, target-day, bin)
    * windowed counts. The explode is stateless and the sum additive,
    * so this aggregation IS the streaming state (≤ types × days ×
    * bins rows, micro-batches fold by addition); the trailing-window
    * semantics live entirely in the offset explode.
    */
  def rollingBinState(ev: DataFrame, windowDays: Int = 7,
                      binWidth: Long = 800L): DataFrame =
    ev.select(col("event_type"), col("d"),
        expr(s"cents div ${binWidth}L").as("bin"))
      .select(col("event_type"), col("bin"),
        explode(sequence(col("d"), col("d") + (windowDays - 1))).as("td"))
      .groupBy("event_type", "td", "bin")
      .agg(count(lit(1)).as("wcnt"))

  /** Finalize the rolling p95 over the state — summary-sized. The
    * data's horizon derives FROM the state (max td = last day +
    * windowDays − 1), so the finish needs no side channel and runs
    * identically over a batch frame or a streaming state table.
    */
  def rollingP95Finish(state: DataFrame, windowDays: Int = 7,
                       binWidth: Long = 800L): DataFrame = {
    val bounds = state.agg(
      (max("td") - (windowDays - 1)).as("hi"))
    val contrib = state.crossJoin(broadcast(bounds))
      .where(col("td") <= col("hi"))
    val cumWin = Window.partitionBy("event_type", "td").orderBy("bin")
    val totWin = Window.partitionBy("event_type", "td")
    val cum = contrib
      .withColumn("cum", sum("wcnt").over(cumWin))
      .withColumn("n", sum("wcnt").over(totWin))
      .withColumn("t", expr("(19L * n + 19) div 20L"))
    val hit = col("cum") >= col("t")
    val est = (lit(binWidth.toDouble) * col("bin") +
      lit(binWidth.toDouble) * (col("t") - (col("cum") - col("wcnt")))
        / col("wcnt")) / lit(100.0)
    cum.groupBy("event_type", "td")
      .agg(max(col("n")).as("n"),
        min_by(when(hit, round(est, 4)), when(hit, col("bin")))
          .as("p95_value"))
      .select(col("event_type"), col("td").as("day"), col("n"),
        col("p95_value"))
      .orderBy("event_type", "day")
  }

  /** Day/cents projection shared by the batch query and the
    * streaming twin's feed.
    */
  def rollingEventFrame(s: SparkSession, dir: String): DataFrame =
    // NULL values carry no bin (r12 fuzz: the micro-unit stats family
    // excludes them explicitly on both engines)
    Tables.events(s, dir).where(col("value").isNotNull)
      .select(col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))

  def eventsRollingP95(s: SparkSession, dir: String,
                       windowDays: Int = 7,
                       binWidth: Long = 800L): DataFrame =
    rollingP95Finish(
      rollingBinState(rollingEventFrame(s, dir), windowDays, binWidth),
      windowDays, binWidth)

  /** SUPPLIER RELIABILITY under uncertainty — Wilson lower bound on
    * each supplier's on-time rate (shipped within 60 days of order,
    * the q12 lateness convention): the ranking statistic that does
    * not let a 2-for-2 supplier outrank a 95-for-100 one. The bound
    * evaluates from exact integer (ontime, n) pairs with the z=1.96
    * constant — identical doubles both engines, tie-stable top 20.
    * One fact⋈orders pass, supplier-keyed aggregate, broadcast name
    * join.
    */
  def supplierWilson(s: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    val z2 = 1.96 * 1.96
    val g = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_shipdate") <=
          col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
          .otherwise(0L)).as("ontime"))
    val phat = col("ontime").cast("double") / col("n")
    val lb = ((phat + lit(z2) / (col("n") * 2)
      - lit(1.96) * sqrt(phat * (lit(1.0) - phat) / col("n")
        + lit(z2) / (col("n") * col("n") * 4)))
      / (lit(1.0) + lit(z2) / col("n")))
    g.join(broadcast(Tables.supplier(s, dir)
        .select("s_suppkey", "s_name")), "s_suppkey")
      .select(col("s_suppkey"), col("s_name"), col("n"), col("ontime"),
        round(phat, 4).as("ontime_rate"),
        round(lb, 6).as("wilson_lb"))
      .orderBy(col("wilson_lb").desc, col("s_suppkey"))
      .limit(topN)
  }

  /** SUPPLIER ORDER-TO-SHIP LEAD TIME — the fulfillment-latency
    * distribution behind q12's on-time flag and the Wilson ranking:
    * per supplier n / mean / standard deviation / max of
    * (shipdate − orderdate) days. Integer day gaps under exact
    * moments (n, Σd, Σd²) — the events_bot_score rule — so the
    * statistics are identical doubles on both engines. One
    * fact⋈orders pass, one supplier aggregate.
    */
  def supplierLeadTime(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("s_suppkey"),
        datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("days"))
    d.groupBy("s_suppkey").agg(count(lit(1)).as("n"),
        sum("days").as("sd"), sum(expr("days * days")).as("sq"),
        max("days").as("max_days"))
      .where(col("n") >= 2)
      .select(col("s_suppkey"), col("n"),
        round(col("sd").cast("double") / col("n"), 2).as("mean_days"),
        round(sqrt((col("sq").cast("double") * col("n") -
          col("sd").cast("double") * col("sd")) /
          (col("n").cast("double") * (col("n") - 1))), 2).as("sd_days"),
        col("max_days"))
      .orderBy("s_suppkey")
  }

  /** RFM SEGMENTATION — the classic marketing cut of a customer
    * base: per customer Recency (days since last order, vs the
    * corpus max date), Frequency (order count), Monetary (total
    * spend), each scored into EXACT GLOBAL QUARTILES, plus the
    * combined `rfm_cell` (r·100 + f·10 + m). Quartile 1 = most
    * recent / fewest orders / lowest spend; ties break on custkey,
    * so the cut is bit-deterministic.
    *
    * Global order statistics must not be one window (single-
    * partition sort at 100 TB); each dimension reuses the
    * quality_deciles two-level decomposition — a MONOTONE value band
    * keys a partitioned within-band rank, the ≤16 band counts
    * prefix-sum on the driver, and global rank = band base + within
    * rank. Three bounded windows instead of three corpus sorts.
    */
  /** FUZZY TERM PAIRS over the part catalog — entity-resolution's
    * typo detector (near-identical product words that should merge):
    * candidate pairs come from SYMSPELL DELETION BLOCKING — every
    * term keys by itself plus each single-character deletion, and
    * any two terms at edit distance 1 provably share a key
    * (deletion/insertion pairs share the shorter string; a
    * substitution pair shares the deletion at the differing
    * position) — so the quadratic all-pairs scan becomes an
    * equi-join whose key space GROWS with the vocabulary, and a
    * final exact `levenshtein = 1` filter discards the few
    * same-key impostors (e.g. transpositions at distance 2). The
    * 100 TB shape: per-term key fan-out = term length (bounded),
    * never vocabulary size.
    */
  def fuzzyTerms(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.part(s, dir)
      .select(explode(split(col("p_name"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    val keyed = words.select(col("t"), col("n"), explode(expr(
      "array_union(array(t), transform(sequence(1, length(t)), " +
        "i -> concat(substring(t, 1, i - 1), " +
        "substring(t, i + 1, length(t)))))")).as("k"))
    keyed.as("x")
      .join(keyed.as("y"),
        col("x.k") === col("y.k") && col("x.t") < col("y.t"))
      .select(col("x.t").as("term_a"), col("y.t").as("term_b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"))
      .distinct()
      .where(levenshtein(col("term_a"), col("term_b")) === 1)
      .orderBy("term_a", "term_b")
  }

  /** HOUR-OF-WEEK ACTIVITY HEATMAP — the 7×24 usage matrix every
    * product dashboard opens with, in long form with each cell's
    * share of total traffic. ISO day numbering (1 = Monday) on both
    * engines; one scan, one (dow, hour) aggregate, the total a
    * broadcast scalar.
    */
  def eventsHeatmap(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select((weekday(col("ts")) + 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hour"))
    val tot = ev.agg(count(lit(1)).cast("double").as("nt"))
    ev.groupBy("dow", "hour").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("dow"), col("hour"), col("n"),
        round(col("n").cast("double") / col("nt"), 6).as("share"))
      .orderBy("dow", "hour")
  }

  /** Pre-checkpoint per-customer metrics — split out so PlanSpec can
    * pin the scan shape (the checkpoint in [[customerRfm]] severs
    * the plan above it).
    */
  private[graft] def rfmBase(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val mx = o.agg(max(col("o_orderdate").cast("date")).as("mxd"))
    // spend sums in integer CENTS (round-per-row, then a long sum):
    // a double sum is fold-order-dependent and the quartile rank
    // would inherit the nondeterminism — the events_ab_test exact-
    // integer-moments rule applied to money
    o.groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .withColumn("monetary",
        round(col("cents").cast("double") / 100, 2))
      .crossJoin(broadcast(mx))
      .withColumn("recency_days",
        datediff(col("mxd"), col("last_order")).cast("long"))
      .select("custkey", "recency_days", "frequency", "monetary")
  }

  def customerRfm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = rfmBase(s, dir).localCheckpoint(true)
    // exact global quartile of `v` (ties on custkey) via banded rank
    def quartile(v: org.apache.spark.sql.Column,
                 band: org.apache.spark.sql.Column,
                 out: String): DataFrame = {
      val w = Window.partitionBy("band").orderBy(v.asc, col("custkey").asc)
      val within = per.withColumn("band", band)
        .withColumn("rin", row_number().over(w))
        .localCheckpoint(true)
      val counts = within.groupBy("band").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      var acc = 0L
      val bases = counts.toSeq.map { case (b, c) =>
        val p = (b, acc); acc += c; p
      }
      val n = acc
      within.join(broadcast(bases.toDF("band", "base")), "band")
        .withColumn(out,
          expr(s"((base + rin - 1) * 4) div ${n}L + 1"))
        .select(col("custkey"), col(out))
    }
    val rq = quartile(col("recency_days"),
      least(floor(col("recency_days") / 128), lit(15L)).cast("long"), "r_q")
    val fq = quartile(col("frequency"),
      least(col("frequency"), lit(15L)).cast("long"), "f_q")
    val mq = quartile(col("monetary"),
      least(floor(col("monetary") / 50000), lit(15L)).cast("long"), "m_q")
    per.join(rq, "custkey").join(fq, "custkey").join(mq, "custkey")
      .select(col("custkey"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_q"), col("f_q"), col("m_q"),
        (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("rfm_cell"))
      .orderBy("custkey")
  }

  /** MANN–WHITNEY U rank-sum test per event type — the
    * distribution-free twin of [[eventsAbTest]] (same deterministic
    * user_id%2 cohorts): does variant A's value distribution
    * stochastically dominate B's, without assuming normality? The
    * rank trap at scale is that "rank each value" is a global sort —
    * instead the test closes over the VALUE HISTOGRAM: group by
    * (type, micro-value) once (the value space is the bounded 2dp
    * grid, not the row count), and the tie-averaged rank of a value
    * is (2·cum − ct + 1)/2 from the running count alone. Doubled
    * rank-sums (R1×2) and the tie-correction Σ(t³−t) ride
    * DECIMAL(38,0) (the dimVariance headroom discipline); U and the
    * tie-corrected z then evaluate on the 1-row-per-type fold as
    * identical IEEE doubles on both engines. One scan, one
    * histogram-sized aggregate, one value-ordered window.
    */
  def eventsMannWhitney(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val g = Tables.events(s, dir).where(col("value").isNotNull)
      .select(col("event_type"), (col("user_id") % 2).as("variant"),
        expr("CAST(round(value * 100) AS BIGINT)").as("micro"))
      .groupBy("event_type", "micro")
      .agg(count(lit(1)).as("ct"),
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("ca"))
    val w = Window.partitionBy("event_type").orderBy("micro")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = g.withColumn("cum", sum("ct").over(w))
    val st = ranked.groupBy("event_type")
      .agg(sum(col("ca").cast(dec)
          * (col("cum") * 2 - col("ct") + 1).cast(dec)).as("r1x2"),
        sum("ca").as("n1"), sum("ct").as("n"),
        sum(col("ct").cast(dec) * col("ct").cast(dec) * col("ct").cast(dec)
          - col("ct").cast(dec)).as("tiesum"))
      .where(col("n1") > 0 && col("n") - col("n1") > 0)
    // all-double tail: every operand below is an exact integer cast
    // to double, so +,-,*,/ and sqrt are bit-identical on both engines
    val n1d = col("n1").cast("double")
    val n2d = (col("n") - col("n1")).cast("double")
    val nd = col("n").cast("double")
    val u1 = col("r1x2").cast("double") / 2.0 - n1d * (n1d + 1.0) / 2.0
    val sigma2 = n1d * n2d / 12.0 *
      (nd + 1.0 - col("tiesum").cast("double") / (nd * (nd - 1.0)))
    st.select(col("event_type"), col("n1").as("n_a"),
        (col("n") - col("n1")).as("n_b"),
        round(u1, 1).as("u"),
        round((u1 - n1d * n2d / 2.0) / sqrt(sigma2), 4).as("z"))
      .orderBy("event_type")
  }

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV test per event type (same
    * user_id%2 cohorts): D = max|F_a − F_b| over the merged support,
    * the whole-shape divergence screen that catches variance or tail
    * shifts a mean test misses. The ECDF gap is kept as an EXACT
    * INTEGER cross-product — |cum_a·n_b − cum_b·n_a| in
    * DECIMAL(38,0) — so the max is over integers and the single
    * division D = max/(n_a·n_b) happens once on the 1-row fold;
    * the asymptotic p-value exp(−2λ²) reuses the same doubles.
    * Same histogram-not-sort anatomy as [[eventsMannWhitney]]: the
    * shuffle key space is the 2dp value grid, never the row count.
    */
  def eventsKsTest(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val g = Tables.events(s, dir).where(col("value").isNotNull)
      .select(col("event_type"), (col("user_id") % 2).as("variant"),
        expr("CAST(round(value * 100) AS BIGINT)").as("micro"))
      .groupBy("event_type", "micro")
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy("event_type").orderBy("micro")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.select(col("event_type"),
      sum("ca").over(w).as("cum_a"), sum("cb").over(w).as("cum_b"))
    val tot = Window.partitionBy("event_type")
    val st = cum
      .withColumn("n_a", max("cum_a").over(tot))
      .withColumn("n_b", max("cum_b").over(tot))
      .groupBy("event_type")
      .agg(first("n_a").as("n_a"), first("n_b").as("n_b"),
        max(abs(col("cum_a").cast(dec) * col("n_b").cast(dec)
          - col("cum_b").cast(dec) * col("n_a").cast(dec))).as("dnum"))
      .where(col("n_a") > 0 && col("n_b") > 0)
    val n1d = col("n_a").cast("double")
    val n2d = col("n_b").cast("double")
    val d = col("dnum").cast("double") / (n1d * n2d)
    // scaled statistic D·√(n₁n₂/(n₁+n₂)) — compared to the critical
    // constants (1.358 at α=.05) directly; deliberately NOT the
    // exp-series p-value: exp is a libm call with no cross-engine
    // rounding contract, √ and ÷ are IEEE-pinned
    st.select(col("event_type"), col("n_a"), col("n_b"),
        round(d, 6).as("ks_d"),
        round(d * sqrt(n1d * n2d / (n1d + n2d)), 4).as("ks_stat"))
      .orderBy("event_type")
  }

  /** HIGHER-MOMENT PROFILE per event type — skewness and excess
    * kurtosis, the tail-shape audit behind outlier budgets and
    * anomaly thresholds. Raw power sums Σx..Σx⁴ are exact integers
    * in micro-cents (x³/x⁴ terms ride DECIMAL(38,0): a 10⁵-micro
    * value to the 4th is 10²⁰ per row — BIGINT wraps at five rows);
    * the central-moment assembly then runs entirely in doubles ON
    * THE k-ROW FOLD, with m2^1.5 spelled m2·√m2 (sqrt is
    * IEEE-exact; pow(x,1.5) is a libm call with no cross-engine
    * rounding contract). One scan, one k-row aggregate.
    */
  def eventsMoments(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val m = col("micro").cast(dec)
    val st = Tables.events(s, dir)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("micro"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("micro").as("s1"),
        sum(m * m).as("s2"), sum(m * m * m).as("s3"),
        sum(m * m * m * m).as("s4"))
      .where(col("n") > 1)
    val nd = col("n").cast("double")
    val mean = col("s1").cast("double") / nd
    val e2 = col("s2").cast("double") / nd
    val e3 = col("s3").cast("double") / nd
    val e4 = col("s4").cast("double") / nd
    val m2 = e2 - mean * mean
    val m3 = e3 - lit(3.0) * mean * e2 + lit(2.0) * mean * mean * mean
    val m4 = e4 - lit(4.0) * mean * e3 + lit(6.0) * mean * mean * e2 -
      lit(3.0) * mean * mean * mean * mean
    st.select(col("event_type"), col("n"),
        round(mean / 100.0, 4).as("mean_val"),
        round(m3 / (m2 * sqrt(m2)), 4).as("skewness"),
        round(m4 / (m2 * m2) - 3.0, 4).as("kurtosis"))
      .orderBy("event_type")
  }

  /** CUSTOMER CHURN HAZARD TABLE (discrete Kaplan–Meier intervals):
    * per customer, the activity span first→last order; a customer
    * whose last order predates the corpus horizon by >90 days has
    * CHURNED in interval ⌊span/90⌋, later actives are CENSORED
    * there. n_risk(t) = customers still active entering t (a reverse
    * cumulative over the interval table — interval-count-sized, not
    * customer-sized) and hazard = d/n is ONE exact-integer division
    * per interval. Survival products are deliberately NOT emitted:
    * a cumulative float product has no cross-engine fold contract;
    * the (d, n, hazard) triple is the loss-free sufficient table.
    * One orders scan, one per-customer aggregate, a tiny window.
    */
  def customerChurnHazard(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey").as("cust"),
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("d"))
    val horizon = o.agg(max("d").as("h"))
    val per = o.groupBy("cust")
      .agg(min("d").as("first_d"), max("d").as("last_d"))
      .crossJoin(broadcast(horizon))
      // `div` (floor integer division) on both engines — a double
      // `/` then CAST would truncate here but round-half-even in
      // DuckDB, disagreeing on exact multiples ± noise
      .select(expr("(last_d - first_d) div 90").as("iv"),
        when(col("h") - col("last_d") > 90L, 1L).otherwise(0L)
          .as("churned"))
    val byIv = per.groupBy("iv")
      .agg(count(lit(1)).as("leaving"), sum("churned").as("d_churn"))
    val wrev = Window.orderBy(col("iv").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byIv.withColumn("n_risk", sum("leaving").over(wrev))
      .select(col("iv"), col("n_risk"), col("d_churn"),
        round(col("d_churn").cast("double")
          / col("n_risk").cast("double"), 6).as("hazard"))
      .orderBy("iv")
  }

  /** PAGE–HINKLEY DRIFT DETECTOR over the dense daily count series
    * per event type (Page 1954; the sequential change-detector the
    * streaming-ML drift literature standardized on): U_t accumulates
    * deviations of each day's count from the RUNNING mean minus a
    * slack δ, PH_t = U_t − min_{i≤t} U_i, alarm when PH exceeds λ.
    * The classic formulation folds floats (the running mean is
    * t-dependent); here the mean is HALF-UP quantized to exact
    * MICRO-units via integer arithmetic — (2·cum·10⁶ + t) div (2·t)
    * — so U, its prefix min, and PH are all exact BIGINTs and the
    * alarm decision is integer comparison on both engines. Per-type
    * series are day-count-sized (the gap-fill grid), so the windows
    * run over a tiny table; one events scan feeds it. 10⁶-scaled
    * cums wrap BIGINT near 10¹² events/type — DECIMAL(38,0) is the
    * documented headroom move, shape unchanged.
    */
  /** The per-day PH series (event_type, d, n, ph in micro-units) —
    * the batch replay the streaming twin (PageHinkleyStream) is
    * spec-pinned bit-equal to.
    */
  def pageHinkleySeries(s: SparkSession, dir: String,
                        deltaEvents: Long = 2L): DataFrame =
    // memoized: the health dashboard consumes it twice (Fano + PH)
    // in one plan; day-grid-sized, so the checkpoint is ~free
    graft.ByproductCache.getOrCompute(s.sparkContext.applicationId,
      s"phseries|$dir|$deltaEvents") {
      pageHinkleySeriesUncached(s, dir, deltaEvents).localCheckpoint(true)
    }

  private def pageHinkleySeriesUncached(s: SparkSession, dir: String,
                                        deltaEvents: Long): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val daily = ev.groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    val meta = ev.agg(min("d").as("lo"), max("d").as("hi"),
      collect_set("event_type").as("tys")).localCheckpoint(true)
    val cal = meta.select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val grid = meta.select(explode(col("tys")).as("event_type"))
      .crossJoin(cal)
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("cum", sum("n").over(w))
      // running mean in micro-units, HALF-UP via pure integer ops
      .withColumn("mq", expr("(2 * cum * 1000000 + t) div (2 * t)"))
      .withColumn("dev",
        col("n") * 1000000L - col("mq") - lit(deltaEvents) * 1000000L)
      .withColumn("u", sum("dev").over(w))
      .withColumn("minu", min("u").over(w))
      .withColumn("ph", col("u") - col("minu"))
      .select("event_type", "d", "n", "ph")
  }

  /** REACTIVATION (WIN-BACK) SERIES — per month, users who returned
    * after a dormancy of > 60 days (the growth team's "resurrected"
    * segment, counted beside actives so the ratio is honest): per
    * (user, active day) the gap to the PREVIOUS active day via one
    * user-keyed lag window; a day opens a reactivation iff gap > 60;
    * monthly rollup counts distinct reactivated users and distinct
    * actives — all integers, one division. One (user, day) distinct
    * aggregate + lag on its own exchange.
    */
  def eventsReactivation(s: SparkSession, dir: String,
                         dormantDays: Long = 60L): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    val gaps = ud.withColumn("gap", col("d") - lag("d", 1).over(w))
      .select(col("user_id"), col("d"),
        (col("gap").isNotNull && col("gap") > dormantDays).as("rea"))
      .withColumn("mon", expr("d div 30"))
    gaps.groupBy("mon")
      .agg(countDistinct("user_id").as("n_active"),
        countDistinct(when(col("rea"), col("user_id")))
          .as("n_reactivated"))
      .select(col("mon"), col("n_active"), col("n_reactivated"),
        round(col("n_reactivated").cast("double") / col("n_active"), 6)
          .as("reactivation_rate"))
      .orderBy("mon")
  }

  /** EVENT-TYPE SHARE TREND — is the traffic MIX drifting (clicks
    * eating views), independent of volume? Per day each type's share
    * of events micro-quantizes to an exact integer (HALF-UP via
    * (2·n·10⁶ + tot) div (2·tot)); the per-type OLS slope of share
    * over the day index then closes over exact integer moments (the
    * part_trend_slope discipline, DECIMAL(38,0) numerators), one
    * double division at the end — slope in share-ppm/day. One scan,
    * day-grid-sized intermediates.
    */
  def eventsShareTrend(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    val tot = daily.groupBy("d").agg(sum("n").as("tot"))
    val shares = daily.join(tot, "d")
      .select(col("event_type"), col("d"),
        expr("(2 * n * 1000000 + tot) div (2 * tot)").as("sh"))
    val base = shares.agg(min("d").as("d0"))
    val st = shares.crossJoin(broadcast(base))
      .select(col("event_type"), (col("d") - col("d0")).as("x"),
        col("sh"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum("x").as("sx"), sum("sh").as("sy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("x").cast(dec) * col("sh").cast(dec)).as("sxy"))
      .where(col("nd") > 1)
    st.select(col("event_type"), col("nd").as("n_days"),
        round((col("nd").cast(dec) * col("sxy")
          - col("sx").cast(dec) * col("sy").cast(dec)).cast("double")
          / (col("nd").cast(dec) * col("sxx")
            - col("sx").cast(dec) * col("sx").cast(dec)).cast("double"),
          4).as("slope_ppm_per_day"))
      .orderBy("event_type")
  }

  /** VALUE BOXPLOT per event type — quartiles, IQR, Tukey fences,
    * and the outlier count the fences imply (the five-number screen
    * before any anomaly modeling): quantiles are exact interpolation
    * over the 2dp micro grid (`percentile` ≡ quantile_cont, the
    * corpusStats precedent), fences a pure double expression off
    * them, and the outlier count one integer comparison per row
    * against a broadcast fence. Two passes (quantiles, then count) —
    * the second prunes to the k-row fence table join.
    */
  def eventsValueBoxplot(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("micro"))
      .localCheckpoint(true)
    val q = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("percentile(micro, 0.25)").as("q1"),
        expr("percentile(micro, 0.5)").as("q2"),
        expr("percentile(micro, 0.75)").as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("lo_fence", col("q1") - lit(1.5) * col("iqr"))
      .withColumn("hi_fence", col("q3") + lit(1.5) * col("iqr"))
      .localCheckpoint(true)
    val outliers = ev.join(broadcast(q.select("event_type", "lo_fence",
        "hi_fence")), "event_type")
      .where(col("micro") < col("lo_fence") ||
        col("micro") > col("hi_fence"))
      .groupBy("event_type").agg(count(lit(1)).as("n_outliers"))
    q.join(outliers, Seq("event_type"), "left")
      .select(col("event_type"), col("n"),
        round(col("q1") / 100.0, 4).as("q1"),
        round(col("q2") / 100.0, 4).as("median"),
        round(col("q3") / 100.0, 4).as("q3"),
        round(col("iqr") / 100.0, 4).as("iqr"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  /** EMPIRICAL-BAYES SHRUNK RETURN RATES per supplier — the
    * small-sample-honest ranking beside supplier_wilson's bound: a
    * 2-of-3-returned supplier must not outrank a 200-of-600 one, so
    * each raw rate shrinks toward the prior with a Beta(α=20, β=80)
    * pseudo-count (the global ~20% return prior as 100 pseudo-obs):
    * rate* = (x+α)/(n+α+β) — ONE division of exact integers, no
    * iteration, identical doubles on both engines. The reranking
    * delta (shrunk vs raw rank) is the audit column. One fact
    * aggregate, supplier-sized output.
    */
  def supplierReturnShrinkage(s: SparkSession, dir: String,
                              alpha: Long = 20L,
                              beta: Long = 80L): DataFrame = {
    val g = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("returned"))
    g.select(col("s_suppkey"), col("n"), col("returned"),
        round(col("returned").cast("double") / col("n"), 6)
          .as("raw_rate"),
        round((col("returned") + lit(alpha)).cast("double")
          / (col("n") + lit(alpha + beta)), 6).as("shrunk_rate"))
      .orderBy(col("shrunk_rate").desc, col("s_suppkey"))
      .limit(20)
  }

  /** MONTHLY DEMAND SEASONAL INDEX per brand — the inventory
    * planner's calendar profile (index 1.0 = an average month;
    * Christmas brands spike Q4): per (brand, month-of-year), share
    * of the brand's annual quantity vs the uniform 1/12 — index =
    * 12·q_month/q_total, exact integer quantities, one division.
    * One lineitem⋈part pass, (brand, month) aggregate.
    */
  def partSeasonalIndex(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"),
        month(col("l_shipdate").cast("date")).cast("long").as("m"))
      .join(Tables.part(s, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "m")
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val tot = Window.partitionBy("p_brand")
    g.withColumn("q_total", sum("qty").over(tot))
      .select(col("p_brand"), col("m"), col("qty"),
        round(col("qty").cast("double") * 12.0
          / col("q_total").cast("double"), 4).as("seasonal_index"))
      .orderBy("p_brand", "m")
  }

  /** ROLLING ACTIVE USERS (DAU / trailing-7 WAU / trailing-30 MAU +
    * DAU/MAU stickiness per day) — the growth dashboard's headline
    * series. Rolling DISTINCT is the non-subtractable aggregate (a
    * sliding window cannot retire a user who may appear again), so
    * the naive form re-scans W days per day. Here each user's
    * activity day covers window-ends [day, min(day+W−1, next−1)] —
    * clipped at the user's NEXT activity so overlapping activities
    * never double-count — and the per-day rolling distinct is the
    * count of covering intervals: the ±1 boundary sweep again
    * (events_peak_concurrency), running over the calendar-sized
    * boundary table. One (user, day) distinct aggregate; per-user
    * lead window on its own exchange; everything after is
    * day-grid-sized.
    */
  def eventsRollingActive(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      .distinct()
      .localCheckpoint(true)
    val wU = Window.partitionBy("user_id").orderBy("d")
    val iv = ud.withColumn("nxt", lead("d", 1).over(wU))
      .localCheckpoint(true)
    val cal = ud.agg(min("d").as("lo"), max("d").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
      .localCheckpoint(true)
    val wCum = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def rolling(w: Int, name: String): DataFrame = {
      val endCap = least(col("d") + (w - 1),
        coalesce(col("nxt") - 1, col("d") + (w - 1)))
      val deltas = iv.select(col("d").as("t"), lit(1L).as("delta"))
        .unionByName(iv.select((endCap + 1).as("t"), lit(-1L).as("delta")))
        .groupBy("t").agg(sum("delta").as("dd"))
      cal.join(deltas.withColumnRenamed("t", "d"), Seq("d"), "left")
        .select(col("d"), coalesce(col("dd"), lit(0L)).as("dd"))
        .withColumn(name, sum("dd").over(wCum))
        .select("d", name)
    }
    val dau = ud.groupBy("d").agg(count(lit(1)).as("dau"))
    cal.join(dau, Seq("d"), "left")
      .select(col("d"), coalesce(col("dau"), lit(0L)).as("dau"))
      .join(rolling(7, "wau7"), "d")
      .join(rolling(30, "mau30"), "d")
      .select(
        date_add(lit("1970-01-01").cast("date"), col("d").cast("int"))
          .cast("string").as("day"),
        col("dau"), col("wau7"), col("mau30"),
        when(col("mau30") > 0,
          round(col("dau").cast("double") / col("mau30"), 4))
          .as("stickiness"))
      .orderBy("day")
  }

  /** EVENTS HEALTH DASHBOARD — the third capstone: one wide row per
    * event type joining the five r11 statistical monitors (Fano
    * burstiness, skew/kurtosis tail shape, Page–Hinkley drift
    * alarms, KS whole-shape divergence, Mann–Whitney rank shift) —
    * the single table an on-call analyst reads before drilling in.
    * Pure composition: each member is its own oracled plan; the
    * joins are k-row (event-type-sized), so the dashboard costs the
    * five scans its members already cost, nothing more. The oracle
    * composes the SAME five member oracle strings as subqueries —
    * drift-proof by construction.
    */
  def eventsHealthDashboard(s: SparkSession, dir: String): DataFrame = {
    val f = eventsFano(s, dir)
      .select(col("event_type"), col("n_days"), col("mean_daily"),
        col("fano"))
    val m = eventsMoments(s, dir)
      .select(col("event_type"), col("n").as("n_events"),
        col("skewness"), col("kurtosis"))
    val p = eventsPageHinkley(s, dir)
      .select(col("event_type"), col("max_ph"), col("n_alarms"))
    val k = eventsKsTest(s, dir)
      .select(col("event_type"), col("ks_stat"))
    val w = eventsMannWhitney(s, dir)
      .select(col("event_type"), col("z").as("mw_z"))
    f.join(m, "event_type").join(p, "event_type")
      .join(k, "event_type").join(w, "event_type")
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("mean_daily"), col("fano"), col("skewness"), col("kurtosis"),
        col("max_ph"), col("n_alarms"), col("ks_stat"), col("mw_z"))
      .orderBy("event_type")
  }

  /** NEXT-EVENT PREDICTION with an honest train/eval split — the
    * first-order Markov baseline every sequence model is graded
    * against: transitions learned on the FIRST half of the calendar
    * (argmax next-type per current type, ties to the lexicographic
    * smallest), accuracy measured on transitions wholly inside the
    * SECOND half (pairs never straddle the split: the lag window
    * partitions by (user, split), so a boundary pair exists in
    * neither side — the leakage rule decontam enforces for corpora,
    * applied to time). All counts exact integers off one scan + one
    * (user, split)-keyed window; the model table is event-type²
    * rows; accuracy is one division per type.
    */
  def eventsNextPred(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      col("ts"), col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val bounds = ev.agg(expr("(min(d) + max(d)) div 2").as("mid"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("split",
        when(col("d") < col("mid"), "train").otherwise("eval"))
    val w = Window.partitionBy("user_id", "split").orderBy("ts", "event_id")
    val pairs = tagged
      .withColumn("prev", lag("event_type", 1).over(w))
      .where(col("prev").isNotNull)
      .select("split", "prev", "event_type")
    val train = pairs.where(col("split") === "train")
      .groupBy("prev", "event_type").agg(count(lit(1)).as("cnt"))
    val mw = Window.partitionBy("prev")
      .orderBy(col("cnt").desc, col("event_type"))
    val model = train
      .withColumn("rn", row_number().over(mw)).where(col("rn") === 1)
      .select(col("prev"),
        col("event_type").as("predicted_next"), col("cnt"))
    val nTrain = train.groupBy("prev").agg(sum("cnt").as("n_train"))
    val evalAcc = pairs.where(col("split") === "eval")
      .join(model.select("prev", "predicted_next"), "prev")
      .groupBy("prev")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("event_type") === col("predicted_next"), 1L)
          .otherwise(0L)).as("n_correct"))
    model.join(nTrain, "prev").join(evalAcc, "prev")
      .select(col("prev"), col("n_train"), col("predicted_next"),
        col("n_eval"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n_eval"), 4)
          .as("accuracy"))
      .orderBy("prev")
  }

  /** REVENUE BRIDGE — period-over-period revenue change decomposed
    * into VOLUME vs PRICE+MIX effects per brand (the FP&A waterfall
    * behind every "why did revenue move" review): periods split at
    * the data's orderdate midpoint (the DiD bound), part-grain
    * decomposition vol_p = r0·Δq/q0 (old realized price × quantity
    * change) with price+mix as the EXACT remainder Δr − vol_p, so
    * the two terms sum to the revenue change to the micro-cent BY
    * CONSTRUCTION at every grain. Exactness: part-level volume
    * effects quantize through IntegralDivide micro-cents
    * ((r0·Δq·10⁶) div q0 — deterministic on both engines, including
    * negative Δq), so brand rollups are INTEGER sums — never a float
    * aggregate over parts. Parts present in only one period carry
    * their whole Δ in price+mix via the zero-volume guard (a new
    * part has no old price to hold constant — the textbook
    * convention). One lineitem⋈orders pass, one part aggregate, one
    * brand rollup.
    */
  def ordersRevenueBridge(s: SparkSession, dir: String): DataFrame = {
    // EXAMINED, LEFT DOUBLE-REFERENCED (r16): the date-midpoint agg
    // and the per-part rollup both reference the lineitem⋈orders
    // join. A partAbcMigration-style checkpoint of the joined frame
    // was measured WORSE here (1.44 → 1.68 s, same subset protocol):
    // this query has no window/classify chain downstream, so the
    // checkpoint's materialization cost exceeds the one join it
    // saves.
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast("long").as("qty"),
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) " +
          "AS BIGINT)").as("cents"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("d")),
        col("l_orderkey") === col("o_orderkey"))
    val bounds = li.agg(expr("(min(d) + max(d)) div 2").as("mid"))
    val per = li.crossJoin(broadcast(bounds))
      .groupBy("l_partkey")
      .agg(sum(when(col("d") < col("mid"), col("qty")).otherwise(0L))
          .as("q0"),
        sum(when(col("d") >= col("mid"), col("qty")).otherwise(0L))
          .as("q1"),
        sum(when(col("d") < col("mid"), col("cents")).otherwise(0L))
          .as("r0"),
        sum(when(col("d") >= col("mid"), col("cents")).otherwise(0L))
          .as("r1"))
      // the r0·Δq·10⁶ product rides DECIMAL(38,0) (the dimVariance
      // headroom rule — a BIGINT wraps past ~$10⁷ part-period
      // revenue × 10⁴ quantity swing); div lands back on BIGINT
      .withColumn("vol_micro",
        when(col("q0") > 0,
          expr("(CAST(r0 AS DECIMAL(38,0)) * (q1 - q0) * 1000000) " +
            "div q0")).otherwise(0L))
      .withColumn("pm_micro",
        (col("r1") - col("r0")) * 1000000L - col("vol_micro"))
    per.join(broadcast(Tables.part(s, dir)
        .select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(col("r1") - col("r0")).as("dc"),
        sum("vol_micro").as("vm"), sum("pm_micro").as("pm"))
      .select(col("p_brand"),
        round(col("dc").cast("double") / 100.0, 2).as("delta_rev"),
        round(col("vm").cast("double") / 1e8, 2).as("volume_effect"),
        round(col("pm").cast("double") / 1e8, 2).as("price_mix_effect"))
      .orderBy("p_brand")
  }

  /** MODEL-CAPACITY CURVE for next-event prediction — order-1 vs
    * order-2 Markov under the SAME honest calendar split as
    * [[eventsNextPred]]: does one more token of context buy
    * accuracy, and at what coverage cost (an order-2 context unseen
    * in training predicts nothing — the sparsity tax every
    * higher-order model pays)? One row per order: model size
    * (contexts), total eligible eval transitions, the covered
    * subset, accuracy ON the covered subset, and coverage — reported
    * separately because folding them into one number would hide
    * exactly the trade this query exists to show. All counts exact
    * integers; two keyed aggregates + two argmax windows over the
    * model tables (event-type² / event-type³ bounded — metadata-
    * sized), transitions from the one (user, split) window.
    */
  def eventsNextPred2(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      col("ts"), col("event_type"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
    val bounds = ev.agg(expr("(min(d) + max(d)) div 2").as("mid"))
    val w = Window.partitionBy("user_id", "split").orderBy("ts", "event_id")
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("split",
        when(col("d") < col("mid"), "train").otherwise("eval"))
      .withColumn("p1", lag("event_type", 1).over(w))
      .withColumn("p2", lag("event_type", 2).over(w))
      .localCheckpoint(true) // consumed by both orders' model + eval
    def leg(order: Int): DataFrame = {
      val keys = if (order == 1) Seq("p1") else Seq("p2", "p1")
      val rows = tagged.where(keys.map(col(_).isNotNull).reduce(_ && _))
        .select((Seq(col("split"), col("event_type")) ++
          keys.map(col)): _*)
      val train = rows.where(col("split") === "train")
        .groupBy((keys :+ "event_type").map(col): _*)
        .agg(count(lit(1)).as("cnt"))
      val mw = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("cnt").desc, col("event_type"))
      val model = train.withColumn("rn", row_number().over(mw))
        .where(col("rn") === 1)
        .select((keys.map(col) :+ col("event_type").as("pred")): _*)
        .localCheckpoint(true) // model size + eval join
      val ev2 = rows.where(col("split") === "eval")
      val total = ev2.agg(count(lit(1)).as("n_eval_total"))
      val covered = ev2.join(model, keys)
        .agg(count(lit(1)).as("n_covered"),
          sum(when(col("event_type") === col("pred"), 1L).otherwise(0L))
            .as("n_correct"))
      model.agg(count(lit(1)).as("n_contexts"))
        .crossJoin(total).crossJoin(covered)
        .select(lit(order).cast("long").as("model_order"),
          col("n_contexts"), col("n_eval_total"), col("n_covered"),
          col("n_correct"),
          round(col("n_correct").cast("double") / col("n_covered"), 4)
            .as("acc_on_covered"),
          round(col("n_covered").cast("double") / col("n_eval_total"), 4)
            .as("coverage"))
    }
    leg(1).unionByName(leg(2)).orderBy("model_order")
  }

  /** TRUNCATED HOLT (double-exponential) SMOOTHER per event type —
    * level + trend, the one-step-ahead forecaster that beats the
    * naive and EWMA baselines when a series is drifting: α=1/2,
    * β=1/4 (power-of-two so every step is integer), re-folded over
    * the last-14-day window each day (the truncated-EWMA move: a
    * bounded window makes per-key streaming state constant-size and
    * every emission final). The recursion runs in exact micro-units
    * with truncating integer division — Spark `div`, DuckDB `//`,
    * and Scala `Long./` all truncate toward zero INCLUDING negatives
    * (trend can be negative), verified, so batch, oracle, and the
    * streaming twin (HoltStream) are bit-equal with no rounding
    * contract beyond the shared op. Batch plan = the events_ewma
    * banded self-join; the per-day fold runs as a codegen'd
    * higher-order `aggregate` over the ≤14-element window array.
    */
  /** The per-day Holt state series (event_type, d, n, st{l, b}) —
    * shared by the forecast surface and the head-to-head backtest,
    * memoized like the Page–Hinkley series.
    */
  private def holtSeries(s: SparkSession, dir: String): DataFrame =
    graft.ByproductCache.getOrCompute(s.sparkContext.applicationId,
      s"holtseries|$dir") {
      val ev = Tables.events(s, dir).select(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      val daily = ev.groupBy("event_type", "d").agg(count(lit(1)).as("n"))
      val meta = ev.agg(min("d").as("lo"), max("d").as("hi"),
        collect_set("event_type").as("tys")).localCheckpoint(true)
      val cal = meta.select(explode(sequence(col("lo"), col("hi"))).as("d"))
      val grid = meta.select(explode(col("tys")).as("event_type"))
        .crossJoin(cal)
      val dense = grid.join(daily, Seq("event_type", "d"), "left")
        .select(col("event_type"), col("d"),
          coalesce(col("n"), lit(0L)).as("n"))
        .localCheckpoint(true)
      val rhs = dense.select(col("event_type"), col("d").as("j"),
        col("n").as("nj"))
      dense
        .join(rhs, Seq("event_type"))
        .where(col("j").between(col("d") - 13, col("d")))
        .groupBy("event_type", "d")
        .agg(first("n").as("n"),
          expr("transform(sort_array(collect_list(struct(j, nj))), " +
            "x -> x.nj)").as("ws"))
        .withColumn("st", expr(HoltFoldSql))
        .select("event_type", "d", "n", "st")
        .localCheckpoint(true)
    }

  def eventsForecastHolt(s: SparkSession, dir: String): DataFrame = {
    holtSeries(s, dir)
      .select(col("event_type"),
        date_add(lit("1970-01-01").cast("date"), col("d").cast("int"))
          .cast("string").as("day"),
        // 6dp: the micro-unit quotient has EXACTLY six decimals, so
        // rounding at 6dp never lands on a .5 boundary — rounding at
        // 4dp did (r12 fuzz: l = 6343550 micro → 6.34355, which
        // Spark's shortest-repr BigDecimal rounds UP and DuckDB's
        // binary-value round rounds DOWN)
        round(col("st.l").cast("double") / 1e6, 6).as("level"),
        round(col("st.b").cast("double") / 1e6, 6).as("trend"),
        round((col("st.l") + col("st.b")).cast("double") / 1e6, 6)
          .as("forecast1"))
      .orderBy("event_type", "day")
  }

  /** FORECAST BACKTEST, HOLT vs SEASONAL-NAIVE head-to-head — the
    * honest model-selection table (never ship a smoother without
    * beating the naive baseline on the same days): for each day
    * with both predictions defined, holt's one-step-ahead is the
    * PREVIOUS day's level+trend (lag over the shared state series)
    * and naive's is the count 7 days back; errors stay exact
    * micro-unit integers (|n·10⁶ − (l+b)| and |n − n₋₇|·10⁶), WAPE
    * is ONE division of exact longs per (type, model), and the
    * winner column is an integer comparison — no float anywhere in
    * the decision. Reuses the memoized Holt state series; one lag
    * window beyond it.
    */
  def eventsForecastEval(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("d")
    val sr = holtSeries(s, dir)
      .withColumn("holt_pred",
        lag(col("st.l") + col("st.b"), 1).over(w))
      .withColumn("naive_pred", lag("n", 7).over(w))
      .where(col("holt_pred").isNotNull && col("naive_pred").isNotNull)
    sr.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("n") * 1000000L - col("holt_pred"))).as("holt_err"),
        sum(abs(col("n") - col("naive_pred")) * 1000000L)
          .as("naive_err"),
        sum(col("n") * 1000000L).as("actual"))
      .where(col("actual") > 0)
      .select(col("event_type"), col("n_days"),
        round(col("naive_err").cast("double") / col("actual"), 6)
          .as("wape_naive"),
        round(col("holt_err").cast("double") / col("actual"), 6)
          .as("wape_holt"),
        when(col("holt_err") < col("naive_err"), "holt")
          .when(col("holt_err") > col("naive_err"), "naive")
          .otherwise("tie").as("winner"))
      .orderBy("event_type")
  }

  /** The Holt fold over a window array `ws` (counts, window order):
    * init (l = ws[1]·10⁶, b = 0), then per element
    * l' = (x·10⁶ + l + b + 1) div 2, b' = (l' − l + 3b + 2) div 4.
    */
  private val HoltFoldSql: String =
    """aggregate(
      |  slice(ws, 2, size(ws) - 1),
      |  named_struct('l', ws[0] * CAST(1000000 AS BIGINT),
      |               'b', CAST(0 AS BIGINT)),
      |  (acc, x) -> named_struct(
      |    'l', (x * 1000000 + acc.l + acc.b + 1) div 2,
      |    'b', (((x * 1000000 + acc.l + acc.b + 1) div 2) - acc.l
      |          + 3 * acc.b + 2) div 4))""".stripMargin

  /** PEAK SESSION CONCURRENCY per day — the capacity-planning number
    * (how many sessions were simultaneously open at the worst
    * moment): sessionize (the 30-min-gap rule shared with
    * events_sessionize), sweep each session as +1 at start / −1 at
    * end+1s (inclusive interval), running-sum the per-instant net
    * deltas in time order, take the max per day. The global running
    * sum is decomposed through the TWO-LEVEL BAND pattern (the
    * customer_gini / export_shards discipline): a day-keyed window
    * runs within each band, the ≤calendar-sized per-day totals
    * prefix-sum on the driver, and band base + within-band sum IS
    * the global sweep exactly — no single-partition window over the
    * boundary table at any scale. All integers.
    */
  def eventsPeakConcurrency(s: SparkSession, dir: String,
                            gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gap = unix_timestamp(col("ts")) -
      unix_timestamp(lag("ts", 1).over(byUser))
    val sess = Tables.events(s, dir)
      .withColumn("new_session",
        when(gap.isNull || gap > gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(byUser))
      .groupBy("user_id", "session_id")
      .agg(min(unix_timestamp(col("ts"))).as("st"),
        max(unix_timestamp(col("ts"))).as("en"))
    val bounds = sess.select(col("st").as("t"), lit(1L).as("delta"))
      .unionByName(sess.select((col("en") + 1L).as("t"),
        lit(-1L).as("delta")))
    val byT = bounds.groupBy("t")
      .agg(sum("delta").as("d"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("starts"))
      .withColumn("day_n", expr("t div 86400"))
    val wIn = Window.partitionBy("day_n").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = byT.withColumn("cin", sum("d").over(wIn))
      .localCheckpoint(true)
    val dayTotals = within.groupBy("day_n").agg(sum("d").as("dt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val bases = dayTotals.toSeq.map { case (dn, dt) =>
      val p = (dn, acc); acc += dt; p
    }
    import s.implicits._
    within.join(broadcast(bases.toDF("day_n", "base")), "day_n")
      .groupBy("day_n")
      .agg(sum("starts").as("n_starts"),
        max(col("base") + col("cin")).as("peak_concurrent"))
      .orderBy("day_n")
  }

  /** FANO FACTOR (index of dispersion) per event type over the dense
    * daily series — the burstiness screen (F ≈ 1 Poisson arrivals,
    * F ≫ 1 bursty/bot-like, F ≪ 1 metronomic/synthetic): variance
    * over mean of the daily counts, both off exact integer moments
    * (n, Σc, Σc²; the squared term rides DECIMAL(38,0)), the
    * mean/variance/ratio tail all-double on the k-row fold. Missing
    * calendar days are observed zeros (the gap-fill rule) — dropping
    * them would understate dispersion exactly where it matters.
    * Reuses the Page–Hinkley dense grid; one events scan.
    */
  def eventsFano(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val st = pageHinkleySeries(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("n").as("s1"),
        sum(col("n").cast(dec) * col("n").cast(dec)).as("s2"))
      .where(col("n_days") > 1 && col("s1") > 0)
    val nd = col("n_days").cast("double")
    val mean = col("s1").cast("double") / nd
    val variance = (col("n_days").cast(dec) * col("s2")
      - col("s1").cast(dec) * col("s1").cast(dec)).cast("double") /
      (nd * (nd - 1.0))
    st.select(col("event_type"), col("n_days"),
        round(mean, 4).as("mean_daily"),
        round(variance / mean, 4).as("fano"))
      .orderBy("event_type")
  }

  def eventsPageHinkley(s: SparkSession, dir: String, deltaEvents: Long = 2L,
                        lambdaEvents: Long = 50L): DataFrame = {
    val series = pageHinkleySeries(s, dir, deltaEvents)
    series.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(max("ph").cast("double") / 1e6, 4).as("max_ph"),
        sum(when(col("ph") > lambdaEvents * 1000000L, 1L).otherwise(0L))
          .as("n_alarms"),
        min(when(col("ph") > lambdaEvents * 1000000L, col("d")))
          .as("first_alarm_d"))
      .orderBy("event_type")
  }

  /** WINSORIZED MEAN per event type — the robust location estimate a
    * metrics platform reports beside the raw mean (one bot or one
    * fat-finger order should not move the KPI): values clipped at the
    * p5/p95 ORDER STATISTICS before averaging. The scale discipline:
    * the bounds are CEIL-RANK order statistics off the VALUE
    * HISTOGRAM (the eventsKsTest rule — cumulative counts over
    * (type, micro) rows, never a sort of the raw events), and because
    * an order statistic is an ACTUAL micro integer (unlike an
    * interpolated percentile, which is a float), the clipped values
    * stay BIGINTs and their sum is exact in any fold order. One scan
    * → histogram aggregate → histogram-sized window → broadcast
    * bounds → one clipped re-aggregate.
    */
  def eventsWinsorized(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir).where(col("value").isNotNull)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("micro"))
    val hist = ev.groupBy("event_type", "micro")
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("micro")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.groupBy("event_type").agg(sum("c").as("n"))
    val cum = hist.withColumn("cum", sum("c").over(w))
      .join(tot, "event_type")
    val bounds = cum.groupBy("event_type")
      .agg(min(when(col("cum") >= expr("(n * 5 + 99) div 100"),
          col("micro"))).as("lo"),
        min(when(col("cum") >= expr("(n * 95 + 99) div 100"),
          col("micro"))).as("hi"))
    ev.join(broadcast(bounds), "event_type")
      .select(col("event_type"), col("micro"), col("lo"), col("hi"),
        least(greatest(col("micro"), col("lo")), col("hi")).as("clip"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("lo").as("lo"), max("hi").as("hi"),
        sum("micro").as("sraw"), sum("clip").as("sclip"))
      .select(col("event_type"), col("n"),
        round(col("lo").cast("double") / 100.0, 4).as("p05"),
        round(col("hi").cast("double") / 100.0, 4).as("p95"),
        round(col("sraw").cast("double") / col("n") / 100.0, 4)
          .as("mean_raw"),
        round(col("sclip").cast("double") / col("n") / 100.0, 4)
          .as("mean_winsorized"))
      .orderBy("event_type")
  }

  /** A/A NULL TEST — the other standard experimentation guardrail
    * beside SRM (Kohavi's rule: run the pipeline with NO treatment
    * and demand a null result): arm-A users re-split by an
    * INDEPENDENT md5 coin (namespaced "aa|" — independence from the
    * user_id%2 assignment is the whole point; reusing the same hash
    * would test nothing) and the full Welch z computed between the
    * two halves. A significant A/A z means the INSTRUMENT is biased
    * — logging skew, assignment leakage, broken variance math — and
    * every real A/B readout from the same pipeline is suspect. Same
    * exact-integer moment machinery as [[eventsAbTest]]; `sig` flags
    * |z| > 1.96 (expected false everywhere on healthy data).
    */
  def eventsAaTest(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(s, dir)
      .where(col("user_id") % 2 === 0)
      .select(col("event_type"),
        (graft.functions.Md5Prefix60(concat(lit("aa|"),
          col("user_id").cast("string"))) % 2).as("variant"),
        expr("cast(round(value * 100) as bigint)").as("micro"))
      .groupBy("event_type", "variant")
      .agg(count(lit(1)).as("n"), sum("micro").as("sx"),
        sum(col("micro") * col("micro")).as("qx"))
    def side(v: Int, suf: String) = g.where(col("variant") === v)
      .select(col("event_type"), col("n").as(s"n_$suf"),
        col("sx").as(s"s_$suf"), col("qx").as(s"q_$suf"))
    def mean(sc: Column, n: Column) = sc.cast("double") / n
    def variance(n: Column, sc: Column, q: Column) =
      (n.cast("decimal(38,0)") * q.cast("decimal(38,0)") -
        sc.cast("decimal(38,0)") * sc.cast("decimal(38,0)"))
        .cast("double") / (n * (n - 1)).cast("double")
    val z = (mean(col("s_a"), col("n_a")) - mean(col("s_b"), col("n_b"))) /
      sqrt(variance(col("n_a"), col("s_a"), col("q_a")) / col("n_a")
        + variance(col("n_b"), col("s_b"), col("q_b")) / col("n_b"))
    side(0, "a").join(side(1, "b"), "event_type")
      .where(col("n_a") > 1 && col("n_b") > 1)
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(z, 4).as("z"),
        (abs(z) > 1.96).as("sig"))
      .orderBy("event_type")
  }

  /** SAMPLE-RATIO-MISMATCH guardrail — the first check every
    * experimentation platform runs BEFORE reading an A/B result
    * (Fabijan et al., ICSE-SEIP'19: a skewed split invalidates the
    * test no matter how pretty the z-score). Randomization unit is
    * the USER, not the event: per event_type, count distinct users
    * per arm (`user_id % 2`, the events_ab_test assignment) and test
    * the 50/50 design with the two-cell equal-probability chi-square,
    * which collapses to (n_a − n_b)²/(n_a + n_b) — an integer
    * numerator over an integer denominator, one double division,
    * identical on both engines. `srm` flags chi² > 3.841 (95%, 1 df).
    * Scale: one scan → (type, user, arm) distinct (map-side partial),
    * then a types-sized aggregate; no per-user state leaves the
    * shuffle.
    */
  def eventsAbSrm(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        (col("user_id") % 2).as("variant"))
      .distinct()
    users.groupBy("event_type")
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
          .cast("double") / (col("n_a") + col("n_b")), 4).as("chi2"),
        (((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
          .cast("double") / (col("n_a") + col("n_b")) > 3.841)
          .as("srm"))
      .orderBy("event_type")
  }

  /** DIFFERENCE-IN-DIFFERENCES estimator — the quasi-experimental
    * design for rollouts that can't be randomized per-request (Card &
    * Krueger'94): treatment = `user_id % 2`, period split at the data
    * midpoint day (the eventsAbCuped bound — derived from the data,
    * never a hard-coded calendar), metric = mean event value. The
    * estimate is (post_t − pre_t) − (post_c − pre_c) on cell means;
    * every cell mean closes over exact integer micro-sums (value at
    * 2dp → ×100 BIGINT), so the four means and the DiD are each ONE
    * double expression — no per-row float aggregate, no fold-order
    * hazard. Scale: single scan → 1 broadcast of a 1-row bound → one
    * types-sized aggregate with four conditional sums (map-side
    * combine does the 2×2 split before the shuffle).
    */
  def eventsDid(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      (col("user_id") % 2).as("treat"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"),
      expr("CAST(round(value * 100) AS BIGINT)").as("micro"))
    val bounds = ev.agg(expr("(min(d) + max(d)) div 2").as("mid"))
    def cell(t: Int, post: Boolean, suf: String) = {
      val in = col("treat") === t &&
        (if (post) col("d") >= col("mid") else col("d") < col("mid"))
      Seq(sum(when(in, col("micro")).otherwise(0L)).as(s"s_$suf"),
        sum(when(in, 1L).otherwise(0L)).as(s"n_$suf"))
    }
    val cells = cell(1, post = false, "pre_t") ++
      cell(1, post = true, "post_t") ++ cell(0, post = false, "pre_c") ++
      cell(0, post = true, "post_c")
    val g = ev.crossJoin(broadcast(bounds)).groupBy("event_type")
      .agg(cells.head, cells.tail: _*)
      .where(col("n_pre_t") > 0 && col("n_post_t") > 0 &&
        col("n_pre_c") > 0 && col("n_post_c") > 0)
    def mean(suf: String) =
      col(s"s_$suf").cast("double") / col(s"n_$suf") / 100.0
    g.select(col("event_type"),
        round(mean("pre_t"), 4).as("pre_t"),
        round(mean("post_t"), 4).as("post_t"),
        round(mean("pre_c"), 4).as("pre_c"),
        round(mean("post_c"), 4).as("post_c"),
        round((mean("post_t") - mean("pre_t"))
          - (mean("post_c") - mean("pre_c")), 4).as("did"))
      .orderBy("event_type")
  }
}
