package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

case class ActivityDay(user_id: Long, d: Long)

/** One boundary-delta row of a rolling-distinct coverage sweep:
  * `kind` selects the structure (dau / w7 / w30 logs share a table).
  */
case class CoverageDelta(kind: String, t: Long, delta: Long)

/** Per-user state: the last activity day — ONE long, constant
  * forever, yet sufficient to maintain rolling DISTINCT actives
  * (the non-subtractable aggregate) incrementally.
  */
case class LastActiveDay(p: Long)

/** INCREMENTALLY-MAINTAINED ROLLING ACTIVES — the 23rd streaming
  * structure and (via its generation-partitioned delta log, the 11th
  * at-rest structure) the IVM form of
  * [[graft.operators.Analytics.eventsRollingActive]]: rolling
  * DISTINCT cannot subtract a retiring user, but each user's
  * coverage interval is determined by (activity day, NEXT activity
  * day) — so when day d arrives for a user whose last day was p, the
  * stream (1) CLIPS p's provisional interval end from p+W to
  * min(p+W, d) by appending a cancel/replace delta pair, and
  * (2) opens d's provisional interval [d, d+W). The multiset of
  * appended deltas differs from the batch formulation's only by
  * pairs summing to zero at equal t, so the serving sweep is equal
  * BY CONSTRUCTION. ≤5 delta rows per new activity day across the
  * three logs (dau / w7 / w30); exactly-once via generation
  * partitions (gen = micro-batch id, dynamic-overwrite idempotent —
  * the AggTable/Layout discipline). Input contract: per-user
  * event-time order across micro-batches (day-sliced waves).
  */
object RollingActiveStream {

  val W7 = 7L
  val W30 = 30L

  def update(userId: Long, rows: Iterator[ActivityDay],
             state: GroupState[LastActiveDay]): Iterator[CoverageDelta] = {
    var p: Option[Long] = state.getOption.map(_.p)
    val out = scala.collection.mutable.ArrayBuffer[CoverageDelta]()
    rows.toSeq.map(_.d).distinct.sorted.foreach { d =>
      if (p.forall(_ < d)) {
        out += CoverageDelta("dau", d, 1L)
        Seq(("w7", W7), ("w30", W30)).foreach { case (k, w) =>
          p.foreach { pp =>
            if (pp + w > d) {
              // clip the previous provisional end p+W back to d
              out += CoverageDelta(k, pp + w, 1L)
              out += CoverageDelta(k, d, -1L)
            }
          }
          out += CoverageDelta(k, d, 1L)
          out += CoverageDelta(k, d + w, -1L)
        }
        p = Some(d)
      }
    }
    p.foreach(v => state.update(LastActiveDay(v)))
    out.iterator
  }

  def deltas(s: SparkSession,
             acts: Dataset[ActivityDay]): Dataset[CoverageDelta] = {
    import s.implicits._
    acts.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Write one micro-batch's deltas as generation `gen` — retried
    * delivery overwrites the SAME partition with the same rows.
    */
  def writeGen(batch: DataFrame, gen: Long, logPath: String): Unit =
    batch.withColumn("gen", lit(gen))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("gen").parquet(logPath)

  /** Attach the maintenance loop: stateful delta derivation feeding
    * the generation-partitioned at-rest delta log.
    */
  def attach(s: SparkSession, acts: Dataset[ActivityDay], logPath: String,
             checkpoint: String): StreamingQuery =
    deltas(s, acts).toDF()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) writeGen(batch, id, logPath)
      }
      .start()

  /** Serve the dashboard FROM the delta log — the batch op's final
    * sweep verbatim over summed deltas; day-grid-sized throughout.
    */
  def serve(s: SparkSession, logPath: String): DataFrame = {
    val log = s.read.parquet(logPath).select("kind", "t", "delta")
    val dau = log.where(col("kind") === "dau")
      .groupBy(col("t").as("d")).agg(sum("delta").as("dau"))
    val cal = dau.agg(min("d").as("lo"), max("d").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
      .localCheckpoint(true)
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("d")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    def roll(kind: String, name: String): DataFrame =
      cal.join(log.where(col("kind") === kind)
          .groupBy(col("t").as("d")).agg(sum("delta").as("dd")),
        Seq("d"), "left")
        .select(col("d"), coalesce(col("dd"), lit(0L)).as("dd"))
        .withColumn(name, sum("dd").over(wCum))
        .select("d", name)
    cal.join(dau, Seq("d"), "left")
      .select(col("d"), coalesce(col("dau"), lit(0L)).as("dau"))
      .join(roll("w7", "wau7"), "d")
      .join(roll("w30", "mau30"), "d")
      .select(
        date_add(lit("1970-01-01").cast("date"), col("d").cast("int"))
          .cast("string").as("day"),
        col("dau"), col("wau7"), col("mau30"),
        when(col("mau30") > 0,
          round(col("dau").cast("double") / col("mau30"), 4))
          .as("stickiness"))
      .orderBy("day")
  }
}
