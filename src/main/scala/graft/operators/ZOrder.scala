package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER layout + min/max file skipping — the multi-dimensional
  * data-skipping pattern (Morton curve; the lakehouse OPTIMIZE
  * ZORDER BY) that a 100 TB table needs when queries filter on MORE
  * than one column: a linear sort clusters only its leading column,
  * so a predicate on any other column reads every file. Interleaving
  * the bits of both columns' normalized ranks makes file z-ranges map
  * to small rectangles in (a, b) space — per-file min/max stats then
  * prune files for a predicate on EITHER column, at write-time cost
  * of one range-repartition.
  *
  * Spark-first decomposition:
  *  - z-key = bit-interleave of the two columns normalized to 8-bit
  *    grid cells by their (driver-collected, metadata-sized) min/max
  *    — plain shift/and/or builtins, all codegen;
  *  - layout = `repartitionByRange(files, zk)` + in-partition sort,
  *    i.e. Spark's own range machinery does the curve bucketing;
  *  - the skipping index = a per-file min/max stats table derived
  *    with the `_metadata.file_path` column (file-count-sized — the
  *    same scale class as Delta's transaction-log stats, read by the
  *    driver, never a data scan);
  *  - a query consults the stats, reads ONLY intersecting files, and
  *    re-applies the exact predicate — conservative selection, so
  *    results ≡ the plain filter (which is the oracle).
  *
  * Parquet row-group min/max pruning composes underneath: the same
  * clustering that narrows file stats narrows row-group stats, so
  * skipped granularity is files first, row groups within survivors.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of `a` (even positions)
    * and `b` (odd positions). Pure shift/and/or — stays inside
    * whole-stage codegen.
    */
  def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Normalize `c` to an 8-bit grid cell given inclusive bounds —
    * the rank-normalization step real z-order implementations run so
    * both dimensions contribute equal bit weight regardless of their
    * native ranges (raw interleave would let the wider column's high
    * bits dominate the curve and starve the other's clustering).
    * Values OUTSIDE [lo, hi] clamp to the edge cells: appended
    * batches may exceed the bounds the base layout was built with —
    * clamping only worsens their clustering, never correctness (file
    * stats record true min/max, not cells).
    */
  def gridCell(c: Column, lo: Long, hi: Long): Column =
    least(lit(255L), greatest(lit(0L),
      floor((c.cast("long") - lit(lo)) * lit(255L) /
        lit(math.max(hi - lo, 1L))).cast("long")))

  val Files = 16

  private def statsPath(p: String) = p + "_stats"

  /** day-index column the layout clusters and filters on */
  private def withDay(ev: DataFrame): DataFrame =
    ev.withColumn("d",
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long"))

  private def fileStats(df: DataFrame): DataFrame =
    df.groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col("user_id").cast("long")).as("u_min"),
        max(col("user_id").cast("long")).as("u_max"),
        min("d").as("d_min"), max("d").as("d_max"))

  private def zsorted(ev: DataFrame, files: Int,
                      uLo: Long, uHi: Long, dLo: Long, dHi: Long): DataFrame =
    ev.withColumn("zk", interleave(gridCell(col("user_id"), uLo, uHi),
        gridCell(col("d"), dLo, dHi), 8))
      .repartitionByRange(files, col("zk")).sortWithinPartitions("zk")
      .drop("zk")


  /** Stats rows for one generation's data files, tagged with the
    * generation (so sidecar writes replace per-generation too).
    */
  private def statsForGen(s: SparkSession, path: String, gen: Long): DataFrame =
    fileStats(s.read.parquet(s"$path/gen=$gen"))
      .withColumn("gen", lit(gen))

  /** Full build: z-ordered data files + the stats sidecar, both as
    * generation 0. The layout is PARTITIONED BY GENERATION so every
    * later append owns a directory it can idempotently replace.
    */
  def buildZorder(s: SparkSession, events: DataFrame, path: String): Unit = {
    val ev = withDay(events)
    // column bounds: one partial-aggregated pass, 4 longs to the
    // driver — the same state class as IVF centroids
    val b = ev.agg(min(col("user_id").cast("long")),
        max(col("user_id").cast("long")), min("d"), max("d"))
      .collect().head
    zsorted(ev, Files, b.getLong(0), b.getLong(1), b.getLong(2),
        b.getLong(3))
      .withColumn("gen", lit(0L))
      .write.mode("overwrite").partitionBy("gen").parquet(path)
    // the skipping index: per-file min/max of both filter columns,
    // derived from the file metadata column — file-count-sized
    statsForGen(s, path, 0L)
      .coalesce(1).write.mode("overwrite").partitionBy("gen")
      .parquet(statsPath(path))
  }

  /** INCREMENTAL append — the maintenance op that keeps the layout
    * usable under corpus growth without re-sorting the world (the
    * 11c/20k discipline on this index): the batch is z-sorted into
    * its OWN GENERATION with the base build's grid (bounds re-derived
    * from the sidecar — no data pass; out-of-range values clamp to
    * edge cells, see [[gridCell]]), and its true-min/max stats rows
    * replace that generation's sidecar partition.
    *
    * Publish order and idempotence: data lands first but becomes
    * visible only when its stats commit — [[skipScan]] resolves files
    * THROUGH the sidecar (the Delta model: the log is the table) — and
    * both writes are dynamic partition overwrites of `gen=<id>`, so a
    * REDELIVERED generation (streaming retry, crash replay) replaces
    * its own files instead of duplicating rows. Fresh generations
    * overlap old files' boxes, so pruning degrades as they accrete; a
    * full [[buildZorder]] rewrite is the OPTIMIZE that restores it.
    */
  def zorderAppend(s: SparkSession, path: String, batch: DataFrame,
                   gen: Long): Unit = {
    require(gen > 0, s"generation 0 is the base build, got $gen")
    if (!batch.isEmpty) {
      val st = s.read.parquet(statsPath(path))
      val b = st.agg(min("u_min"), max("u_max"), min("d_min"), max("d_max"))
        .collect().head
      // writer-scoped overwrite mode (the AggTable r10-advice fix):
      // a session-global flip races with concurrent writers
      zsorted(withDay(batch), math.max(Files / 4, 2), b.getLong(0),
          b.getLong(1), b.getLong(2), b.getLong(3))
        .withColumn("gen", lit(gen))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gen").parquet(path)
      statsForGen(s, path, gen)
        .coalesce(1).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gen")
        .parquet(statsPath(path))
    }
  }

  /** Write `events` z-ordered by (user_id, day) into `Files` files
    * plus the per-file min/max stats sidecar. Built once per dir
    * (stats _SUCCESS, written last, is the publish marker).
    */
  def ensureZordered(s: SparkSession, dir: String): String = {
    val path = graft.IndexCache.dirFor(dir, "zorderg").toString
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(statsPath(path), "_SUCCESS"))) {
      buildZorder(s, Tables.events(s, dir), path)
    }
    path
  }

  /** Files whose [min,max] box intersects the predicate box —
    * conservative (false positives only), driver-side over the
    * file-count-sized stats.
    */
  def selectFiles(s: SparkSession, path: String,
                  uLo: Long, uHi: Long, dLo: Long, dHi: Long): Seq[String] =
    s.read.parquet(statsPath(path)).collect().toIndexedSeq
      .filter { r =>
        r.getAs[Long]("u_min") <= uHi && r.getAs[Long]("u_max") >= uLo &&
        r.getAs[Long]("d_min") <= dHi && r.getAs[Long]("d_max") >= dLo
      }
      .map(_.getAs[String]("file"))

  /** Skip-scan: read only intersecting files, then re-apply the
    * exact predicate (selection is conservative, so this is the
    * whole correctness argument).
    */
  def skipScan(s: SparkSession, path: String,
               uLo: Long, uHi: Long, dLo: Long, dHi: Long): DataFrame = {
    val sel = selectFiles(s, path, uLo, uHi, dLo, dHi)
    val base =
      if (sel.isEmpty) s.read.parquet(path).drop("gen").where(lit(false))
      else s.read.parquet(sel: _*)
    base.where(col("user_id").between(uLo, uHi) &&
      col("d").between(dLo, dHi))
  }

  /** Surface query: a 40-user × 8-day box over the z-ordered events
    * (days 19731–19738 = 2024-01-09..16), aggregated by event type —
    * answered through the skipping index; ≡ the plain filter.
    */
  def zorderSkipQuery(s: SparkSession, dir: String): DataFrame = {
    val path = ensureZordered(s, dir)
    skipScan(s, path, 40L, 79L, 19731L, 19738L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("event_type")
  }
}
