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
}
