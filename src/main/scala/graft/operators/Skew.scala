package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the portable fix when one hot key
  * would pin a whole join or aggregation on a single reducer (AQE's
  * skew-join split only covers sort-merge joins; salting also works
  * for shuffled-hash joins and combine-less aggregations).
  */
object Skew {

  /** Salted equi-join: the probe (large, possibly skewed) side gets a
    * deterministic salt from a high-cardinality column, the build
    * side is replicated `factor`×, and the join keys on (key, salt) —
    * a hot key's rows spread over `factor` reducers instead of one.
    * Result is EXACTLY the plain equi-join (each probe row meets each
    * build row once: the one replica sharing its salt).
    *
    * The salt must derive from a column, not rand(): task retries
    * re-evaluate the expression, and a non-deterministic salt would
    * let a retried partition land rows on different replicas than its
    * first attempt observed.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltBy: String, factor: Int): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val salted = probe.withColumn("_salt",
      pmod(hash(col(saltBy)), lit(factor)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Demonstration workload: enrich each event with its user's
    * average value through a salted join (user_id is the natural
    * skew key of an event log — one bot user can be 10% of a 100 TB
    * stream), then count per-user events above that average. The
    * result is salt-invariant, so the DuckDB oracle is the PLAIN
    * join — correctness of the salting is exactly what the hash
    * match proves.
    */
  def saltedEnrichQuery(s: SparkSession, dir: String,
                        factor: Int = 8): DataFrame = {
    val ev = Tables.events(s, dir).select("event_id", "user_id", "value")
    val userStats = Tables.events(s, dir)
      .groupBy("user_id").agg(avg("value").as("user_avg"))
    saltedJoin(ev, userStats, "user_id", "event_id", factor)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > col("user_avg"), 1L).otherwise(0L))
          .as("n_above"))
      .orderBy("user_id")
  }

  /** KEY-SKEW DIAGNOSTIC — the report that DECIDES when the salted
    * join (above), AQE skew splitting, or a blocking-key redesign is
    * needed: per-key load shares for the heaviest keys of a join/agg
    * key column. At 100 TB nobody eyeballs a groupBy output; the
    * operational question is "what fraction of rows does the top key
    * carry, and how many keys until the curve flattens" — exactly
    * rank, share, cumulative share for the top keys.
    *
    * Shape: one key-partitioned count (map-side partial agg), then
    * the [[TopKAgg]] heap picks the top `n` GLOBALLY without sorting
    * the key space (a window rank would shuffle every key's count to
    * one partition — the skew report must not itself be skewed), and
    * the total arrives as a 1-row broadcast (Q22 scalar pattern).
    * Shares are BIGINT/BIGINT single divisions — bit-deterministic.
    */
  def keySkewReport(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key).cast("long").as("k"))
      .agg(count(lit(1)).as("n"))
    val agg = TopKAgg.topK(topN)
    // heap key: count descending (negated), key ascending on ties —
    // deterministic total order like every other heap consumer
    val top = counts
      .agg(agg((-col("n")).cast("double"), col("k")).as("top"),
        sum(col("n")).as("total"), count(lit(1)).as("n_keys"))
      .select(posexplode(col("top.items")), col("total"), col("n_keys"))
      .select((col("pos") + 1).as("rank"), col("col.id").as("key"),
        (-col("col.key")).cast("long").as("n"), col("total"),
        col("n_keys"))
    val w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    top.select(col("rank"), col("key"), col("n"), col("n_keys"),
        round(col("n").cast("double") / col("total").cast("double"), 4)
          .as("share"),
        round(sum(col("n")).over(w).cast("double")
          / col("total").cast("double"), 4).as("cum_share"))
      .orderBy("rank")
  }

  /** Surface query: the event log's user_id load profile. */
  def keySkewQuery(s: SparkSession, dir: String): DataFrame =
    keySkewReport(Tables.events(s, dir).select("user_id"), "user_id")
}
