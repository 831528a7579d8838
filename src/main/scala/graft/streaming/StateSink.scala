package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.operators.WalReplay
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incrementally-maintained recovery state as a STREAMING SINK — the
  * write side of the reference's persistence loop (writeWALLog +
  * periodic takeSnapshot) in Structured Streaming form: each
  * micro-batch's per-key partial state ([[WalReplay.partialState]])
  * merges (⊎, [[WalReplay.mergeStates]]) into a versioned parquet
  * snapshot that any batch reader can load.
  *
  * Publish protocol: a version is written to a dot-prefixed staging
  * directory and atomically renamed into place as
  * `v=<batchId>_<attempt>` — a published directory is NEVER mutated,
  * so retries of the same batchId (foreachBatch's failure contract)
  * publish a new attempt beside the old one and readers always see
  * whole versions. The merge folds in only versions with a STRICTLY
  * lower batchId, so a retry overwrites its own previous attempt
  * logically without double-counting (same discipline as the
  * reference's snapshot-then-update-lastSnapshotID ordering,
  * persistence.cc takeSnapshot). Retention keeps the latest two
  * batchIds; readers are expected to consume a loaded state within
  * that window (production would widen it with a TTL).
  */
object StateSink {

  /** (batchId, attempt, dir) for committed versions, oldest first.
    * Package-visible: [[CdcStream]] reuses the same publish protocol.
    */
  private[streaming] def versionDirs(root: String): Seq[(Long, Long, String)] = {
    val p = Paths.get(root)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val stream = Files.list(p)
      try {
        val it = stream.iterator()
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
        while (it.hasNext) {
          val d = it.next()
          val n = d.getFileName.toString
          if (n.startsWith("v=") && Files.exists(d.resolve("_SUCCESS"))) {
            n.stripPrefix("v=").split("_", 2) match {
              case Array(b, a) => out += ((b.toLong, a.toLong, d.toString))
              case _ => ()
            }
          }
        }
        out.toSeq.sortBy(v => (v._1, v._2))
      } finally stream.close()
    }
  }

  private[streaming] def deleteTree(dir: String): Unit = {
    val stream = Files.walk(Paths.get(dir))
    try {
      stream.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    } finally stream.close()
  }

  /** Latest committed state, or None before the first batch.
    *
    * EAGERLY materialized (`localCheckpoint`): retention deletes
    * version directories as newer batches commit, and a lazy frame
    * over a deleted directory would throw FileNotFound whenever the
    * caller executes it after the window moved — the returned frame
    * must stay valid however long the caller holds it. The copy is
    * one state's worth of rows (per-key aggregates, not the log), so
    * the materialization is bounded by key cardinality.
    */
  def readState(s: SparkSession, root: String): Option[DataFrame] =
    versionDirs(root).lastOption.map { case (_, _, dir) =>
      s.read.parquet(dir).localCheckpoint(true)
    }

  /** The foreachBatch function: fold this batch into the state.
    * Usage:
    * {{{
    * events.writeStream.foreachBatch(StateSink.update(spark, root) _)
    * }}}
    */
  def update(s: SparkSession, root: String)(batch: DataFrame,
                                            batchId: Long): Unit = {
    // skip-if-unchanged (the reference's own persistence TODO,
    // doc/persistence.md): an empty micro-batch contributes no
    // partial state, so the merged snapshot would be BYTE-IDENTICAL
    // to the previous version — publishing it only churns version
    // dirs and retention. Skipping is idempotent under redelivery
    // (the retry sees the same empty batch and skips again) and
    // cannot starve readers: versions exist exactly for the batches
    // that changed the state.
    if (batch.isEmpty) return
    val partial = WalReplay.partialState(batch)
    val versions = versionDirs(root)
    // merge only versions STRICTLY below this batchId: a re-delivered
    // batch must not fold its own previous attempt back in
    val prev = versions.filter(_._1 < batchId).lastOption
    val merged = prev match {
      case Some((_, _, dir)) =>
        WalReplay.mergeStates(s.read.parquet(dir), partial)
      case None => partial
    }
    // stage (invisible to readers), then atomic rename into place —
    // a published version directory is never written into again
    val attempt = versions.filter(_._1 == batchId)
      .map(_._2).maxOption.getOrElse(-1L) + 1L
    val staging = Paths.get(root, s".staging-$batchId-$attempt")
    merged.write.mode("overwrite").parquet(staging.toString)
    Files.move(staging, Paths.get(root, s"v=${batchId}_$attempt"),
      StandardCopyOption.ATOMIC_MOVE)
    // retain all attempts of the two newest batchIds; older versions
    // are re-derivable from the log
    val keep = versionDirs(root).map(_._1).distinct.sorted.takeRight(2).toSet
    versionDirs(root).filterNot(v => keep(v._1))
      .foreach { case (_, _, dir) => deleteTree(dir) }
  }

  // ----------------------------------------- periodic trigger policy

  /** Committed pending partials: (batchId, attempt, stampMs, dir),
    * oldest first. Stamp = the injected clock at write time, stored
    * inside the directory so age is deterministic under a test clock.
    */
  private def pendingDirs(root: String): Seq[(Long, Long, Long, String)] = {
    val p = Paths.get(root, "pending")
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val stream = Files.list(p)
      try {
        val it = stream.iterator()
        val out = scala.collection.mutable
          .ArrayBuffer.empty[(Long, Long, Long, String)]
        while (it.hasNext) {
          val d = it.next()
          val n = d.getFileName.toString
          if (n.startsWith("b=") && Files.exists(d.resolve("_SUCCESS"))) {
            n.stripPrefix("b=").split("_", 2) match {
              case Array(b, a) =>
                val ms = Files.readString(d.resolve("_ms")).trim.toLong
                out += ((b.toLong, a.toLong, ms, d.toString))
              case _ => ()
            }
          }
        }
        out.toSeq.sortBy(v => (v._1, v._2))
      } finally stream.close()
    }
  }

  /** PERIODIC AUTO-SNAPSHOT (r13, the reference's persistence.md TODO
    * #1 — 定时快照, the one unticked reference-doc box): instead of
    * rewriting the full snapshot every micro-batch, each batch stages
    * its per-key PARTIAL state under `pending/` (the WAL-tail analog:
    * batch-sized, disjoint slices) and the snapshot publishes only
    * when the trigger fires —
    *   - at least every `everyN` batches: ≥ everyN distinct pending
    *     batches force a publish (bounds crash-recovery fold length,
    *     the reference's motivation for snapshotting at all), or
    *   - at most `maxAgeMs` of staleness: the OLDEST pending partial
    *     waiting ≥ maxAgeMs forces a publish even when the batch
    *     count hasn't accrued — an idle-then-trickle stream cannot
    *     hold changes hostage (the age gate runs on EMPTY batches
    *     too, which is why the skip-if-unchanged check sits after the
    *     pending write, not before the trigger).
    * Composes with r12's skip-if-unchanged: an empty batch stages
    * nothing, and with nothing pending, nothing publishes. The
    * publish folds the previous snapshot ⊎ every pending partial
    * (disjoint slices — the mergeStates precondition) through the
    * same stage-then-atomic-rename protocol, then GCs pending ≤ the
    * published batchId. Redelivery idempotence is unchanged: a
    * re-delivered mid-window batch republishes its pending dir as a
    * higher attempt (max attempt wins at fold; content identical), a
    * re-delivered TRIGGER batch stages a partial that is already ≤
    * the published version and is ignored and GC'd — no second
    * version, no double count.
    *
    * At 100 TB this is the difference between a per-batch full-state
    * write (state-sized I/O every few seconds) and state-sized I/O
    * once per N batches with batch-sized appends in between.
    */
  def updatePeriodic(s: SparkSession, root: String, everyN: Int,
                     maxAgeMs: Long,
                     now: () => Long = () => System.currentTimeMillis())(
                     batch: DataFrame, batchId: Long): Unit = {
    val published = versionDirs(root).lastOption.map(_._1)
    def livePending = pendingDirs(root)
      .filter(p => published.forall(p._1 > _) && p._1 <= batchId)
    if (!batch.isEmpty && published.forall(batchId > _)) {
      val partial = WalReplay.partialState(batch)
      val attempt = pendingDirs(root).filter(_._1 == batchId)
        .map(_._2).maxOption.getOrElse(-1L) + 1L
      val staging = Paths.get(root, "pending", s".staging-$batchId-$attempt")
      partial.write.mode("overwrite").parquet(staging.toString)
      Files.writeString(staging.resolve("_ms"), now().toString)
      Files.move(staging, Paths.get(root, "pending", s"b=${batchId}_$attempt"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val pend = livePending
    val pendIds = pend.map(_._1).distinct
    val oldest = pend.map(_._3).minOption
    val fire = pendIds.size >= everyN ||
      oldest.exists(ms => now() - ms >= maxAgeMs)
    if (!fire) return
    // fold: previous snapshot ⊎ the max-attempt partial of each
    // pending batch (disjoint slices of the log)
    val parts = pendIds.map { id =>
      val d = pend.filter(_._1 == id).maxBy(_._2)._4
      s.read.parquet(d)
    }
    val prevState = versionDirs(root).lastOption
      .map { case (_, _, dir) => s.read.parquet(dir) }
    val merged = WalReplay.mergeStates(prevState.toSeq ++ parts: _*)
    val pubId = pendIds.max
    val attempt = versionDirs(root).filter(_._1 == pubId)
      .map(_._2).maxOption.getOrElse(-1L) + 1L
    val staging = Paths.get(root, s".staging-$pubId-$attempt")
    merged.write.mode("overwrite").parquet(staging.toString)
    Files.move(staging, Paths.get(root, s"v=${pubId}_$attempt"),
      StandardCopyOption.ATOMIC_MOVE)
    pendingDirs(root).filter(_._1 <= pubId)
      .foreach { case (_, _, _, dir) => deleteTree(dir) }
    val keep = versionDirs(root).map(_._1).distinct.sorted.takeRight(2).toSet
    versionDirs(root).filterNot(v => keep(v._1))
      .foreach { case (_, _, dir) => deleteTree(dir) }
  }
}
