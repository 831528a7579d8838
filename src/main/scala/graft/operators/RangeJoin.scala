package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join: match points into intervals on a
  * shared key without an inequality join.
  *
  * Spark plans a non-equi join predicate as BroadcastNestedLoopJoin —
  * O(|L|·|R|) comparisons and a broadcast of a whole side, the
  * classic big×big interval-join failure. The banded form restores an
  * EQUI-join: quantize time into fixed buckets, explode each interval
  * into the buckets it overlaps, bucket each point once, hash-join on
  * (key, bucket), then apply the exact containment predicate to
  * discard the band edges. Cost: |R| × (interval_len/bucket + 1)
  * exploded rows and one hash shuffle — linear, tunable by bucket
  * width (wide buckets = fewer exploded rows, more edge discards;
  * the sweet spot is bucket ≈ median interval length). DuckDB's
  * IEJoin and Flink's interval join solve the same problem engine-
  * side; on Spark the banding IS the operator.
  *
  * A point matches each interval at most once (an interval lists each
  * overlapped bucket exactly once), so no post-join dedup is needed.
  */
object RangeJoin {

  /** Join `points` rows into containing `intervals` rows
    * (start ≤ point ≤ end, equal `key`). Output: all point columns +
    * all interval payload columns. Column names must not collide
    * (select/alias before calling).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      key: String, pointTs: String,
                      startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    val pb = points.withColumn("__bucket",
      floor(unix_timestamp(col(pointTs)) / bucketSeconds))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    pb.join(ib, Seq(key, "__bucket"))
      .where(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bucket")
  }

  /** Surface query: attribute each purchase event to the 30-min-gap
    * session containing it — the point-in-interval join every
    * attribution/feature pipeline runs, here as big×big (sessions are
    * |events|-scaled, not a broadcastable dim). Buckets of 1 h ≈ the
    * session-length scale.
    */
  def sessionAttributionQuery(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gap = unix_timestamp(col("ts")) -
      unix_timestamp(lag("ts", 1).over(byUser))
    val sessions = Tables.events(s, dir)
      .withColumn("new_session",
        when(gap.isNull || gap > 1800L, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(byUser))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("s_start"), max("ts").as("s_end"))
    val purchases = Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    pointInInterval(purchases, sessions, "user_id", "ts",
      "s_start", "s_end", bucketSeconds = 3600L)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ets"),
        col("session_id"),
        date_format(col("s_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("s_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"))
      .orderBy("event_id")
  }
}
