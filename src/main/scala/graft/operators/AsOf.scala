package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed point-in-time (as-of) join: for each left row, the
  * single right row with the greatest right-time at or before the
  * left row's time, per key — the join a feature store / training
  *-data pipeline uses to attach "the latest signal known at event
  * time" without leaking the future.
  *
  * Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
  * relational encoding — an inequality theta-join then a per-left-row
  * argmax — degenerates to a per-key cross product (O(L·R) within
  * each key) plus a second aggregation shuffle. This implementation
  * is the UNION-TAG formulation instead: tag both sides, union them,
  * and run one `last(right_payload) IGNORE NULLS` window per key over
  * the time-sorted merge — each left row picks up the most recent
  * right payload that precedes it in the sort. Cost: ONE shuffle on
  * the key and one sort, linear in |L|+|R| — the plan shape survives
  * 100 TB because it is exactly a sort-merge join's exchange profile
  * with no pairwise expansion. (Flink's event-time temporal join and
  * kdb's aj are the same merge under the hood.)
  *
  * Tie semantics match DuckDB's `ASOF JOIN ... ON l.t >= r.t`: a
  * right row AT the left row's instant is visible (right sorts before
  * left on equal time). Left rows with no preceding right row keep
  * NULL right columns (left-outer as-of).
  *
  * Determinism contract: at most one right row per (key, time) —
  * pre-aggregate duplicates away (as [[eventsAsofQuery]] does);
  * otherwise which duplicate wins depends on partition-internal
  * order.
  */
object AsOf {

  /** As-of join `left` to `right` on equal `key` and the latest
    * `rightTime` <= `leftTime`. Output: every left column, then every
    * non-key right column (NULL when no right row precedes).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String): DataFrame = {
    val rPayloadCols = right.columns.filterNot(_ == key)
    val rStructType = right.select(
      struct(rPayloadCols.map(col): _*).as("__r")).schema("__r").dataType
    val lTagged = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStructType).as("__r"))
    val rTagged = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(left.select(
        struct(left.columns.map(col): _*).as("__l")).schema("__l").dataType)
        .as("__l"),
      struct(rPayloadCols.map(col): _*).as("__r"))
    // right-before-left on equal (__t): the window's current row sees
    // a right payload stamped at its own instant — the >= semantics
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols: Seq[Column] =
      left.columns.toIndexedSeq.map(c => col(s"__l.$c").as(c))
    val rightCols: Seq[Column] =
      rPayloadCols.toIndexedSeq.map(c => col(s"__pick.$c").as(c))
    lTagged.unionByName(rTagged)
      .withColumn("__pick", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols ++ rightCols: _*)
  }

  /** Surface query: each purchase event annotated with the user's
    * most recent click at or before the purchase — the
    * "latest-feature-at-event-time" shape. Clicks are pre-aggregated
    * per (user, instant) so the as-of pick is deterministic.
    */
  def eventsAsofQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("value")).as("click_value"))
      .select(col("user_id"), col("click_ts"), col("click_value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    asofJoin(purchases, clicks, "user_id", "ts", "click_ts")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ets"),
        round(col("value"), 4).as("pvalue"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        round(col("click_value"), 4).as("click_value"))
      .orderBy("event_id")
  }
}
