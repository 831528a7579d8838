package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
