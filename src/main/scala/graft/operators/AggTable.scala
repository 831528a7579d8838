package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MAINTAINED AGGREGATE TABLE — incremental view maintenance for the
  * daily per-type rollup, the eighth maintained structure (after the
  * IVF cells, kNN graph, postings, layout, signature index, HNSW
  * layers, spell dictionary): the dashboard query every events
  * pipeline serves ("daily counts and value sums per event type")
  * kept current WITHOUT rescanning history.
  *
  * The distributive-aggregate trick: count and sum split into
  * per-generation PARTIALS that add. Each arriving batch lands as
  * one generation of (day, event_type, n, sv_micros) partial rows —
  * partitioned by (gen, day) — and serving folds generations with
  * the same groupBy that built them. Exactly-once without a
  * transaction log is the [[graft.streaming.LayoutMaintenance]]
  * discipline verbatim: the generation id IS the batch id, and the
  * write is a dynamic partition overwrite of its own `gen=<id>`
  * partitions, so a redelivered batch REPLACES its prior self
  * instead of double-counting. Value sums are exact micro-unit longs
  * (`round(value·10⁶)` — integer partials add order-free, so
  * maintained ≡ rebuild is EXACT equality, no float tolerance).
  *
  * Scale shape: a batch's write touches only its own (gen, day)
  * partitions (churn-local); serving a day range reads only that
  * range's partitions (PartitionFilters on day — spec-pinned) and
  * folds rows proportional to generations × types × days, never
  * events. Generations accrete; the OPTIMIZE move is a periodic
  * [[build]] rebuild into gen 0 (LayoutMaintenance's compaction
  * story), after which [[vacuumGens]] drops the folded generations.
  */
object AggTable {

  /** The maintained aggregate's shape: exact integer partials per
    * (epoch day, event type). Input needs (ts, event_type, value).
    */
  def dailyAgg(events: DataFrame): DataFrame =
    events.select(
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        col("event_type"),
        round(col("value") * 1000000L, 0).cast("long").as("mv"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"), sum("mv").as("sv_micros"))

  private def writeGen(s: SparkSession, path: String, partials: DataFrame,
                       gen: Long): Unit = {
    // Exact generation replacement: dynamic partition overwrite alone
    // only replaces the (gen, day) partitions THIS attempt produces —
    // a redelivered batch whose day set shrank (source mutated across
    // restart) would leave the earlier attempt's extra day partitions
    // in place, and serve would double-count those days. Deleting the
    // generation's directory first makes replacement exact regardless
    // of day-set drift. The overwrite mode is scoped to this WRITER
    // (not session conf, which races any concurrent write sharing the
    // session).
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    val genDir = new org.apache.hadoop.fs.Path(root, s"gen=$gen")
    if (fs.exists(genDir)) fs.delete(genDir, true)
    partials.withColumn("gen", lit(gen))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("gen", "day").parquet(path)
  }

  /** Bootstrap: the base corpus as generation 0. */
  def build(s: SparkSession, path: String, events: DataFrame): Unit =
    writeGen(s, path, dailyAgg(events), gen = 0L)

  /** Fold one arriving batch in as generation `gen` (use batch id +
    * 1 under streaming — gen 0 is the bootstrap). Idempotent on
    * redelivery: the dynamic overwrite replaces the generation's own
    * partitions.
    */
  def insert(s: SparkSession, path: String, batch: DataFrame,
             gen: Long): Unit =
    writeGen(s, path, dailyAgg(batch), gen)

  /** Serve the rollup over an optional day range — generation fold =
    * the same distributive groupBy; day predicate reaches the scan
    * as a partition filter.
    */
  def serve(s: SparkSession, path: String,
            dayLo: Option[Long] = None,
            dayHi: Option[Long] = None): DataFrame = {
    val base = s.read.parquet(path)
    val ranged = (dayLo, dayHi) match {
      case (Some(lo), Some(hi)) =>
        base.where(col("day") >= lo && col("day") <= hi)
      case (Some(lo), None) => base.where(col("day") >= lo)
      case (None, Some(hi)) => base.where(col("day") <= hi)
      case _ => base
    }
    // partition-directory inference types `day` as int — cast back to
    // the builder's long so the serve contract matches dailyAgg
    ranged.groupBy(col("day").cast("long").as("day"), col("event_type"))
      .agg(sum("n").as("n"), sum("sv_micros").as("sv_micros"))
  }

  /** Drop generations ≤ `upToGen` except 0 — run AFTER a [[build]]
    * rebuild has folded them into gen 0. Deletion-only, so replay
    * stays correct at every intermediate state only once the rebuild
    * is published (same crash story as the WAL vacuum: re-running
    * finishes the job).
    */
  def vacuumGens(s: SparkSession, path: String, upToGen: Long): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val dead = fs.listStatus(root).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
      .filter(g => g > 0L && g <= upToGen)
    dead.foreach(g => fs.delete(new org.apache.hadoop.fs.Path(root, s"gen=$g"), true))
    dead
  }

  /** Registry surface: bootstrap from ~3/4 of the events, fold the
    * rest in as two maintained generations, serve the full range —
    * which the oracle recomputes as the direct one-shot aggregate
    * over ALL events (maintained ≡ rebuild, exact). Built once per
    * sf dir behind a done marker.
    */
  def dailyAggQuery(s: SparkSession, dir: String): DataFrame = {
    val root = graft.IndexCache.dirFor(dir, "aggtable")
    val path = root.resolve("daily").toString
    val done = root.resolve("_done")
    if (!java.nio.file.Files.exists(done)) {
      java.nio.file.Files.createDirectories(root)
      val ev = Tables.events(s, dir)
      build(s, path, ev.where(col("event_id") % 4 =!= 3))
      insert(s, path,
        ev.where(col("event_id") % 4 === 3 && col("user_id") % 2 === 0),
        gen = 1L)
      insert(s, path,
        ev.where(col("event_id") % 4 === 3 && col("user_id") % 2 =!= 0),
        gen = 2L)
      java.nio.file.Files.write(done, Array.emptyByteArray)
    }
    serve(s, path)
      .select(
        date_add(lit("1970-01-01").cast("date"), col("day").cast("int"))
          .cast("string").as("day"),
        col("event_type"), col("n"),
        round(col("sv_micros").cast("double") / 1000000L, 4)
          .as("sum_value"))
      .orderBy("day", "event_type")
  }
}
