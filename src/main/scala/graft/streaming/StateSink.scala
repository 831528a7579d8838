package graft.streaming

import java.nio.file.{Files, Paths}

import graft.operators.WalReplay
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incrementally-maintained recovery state as a STREAMING SINK — the
  * write side of the reference's persistence loop (writeWALLog +
  * periodic takeSnapshot) in Structured Streaming form: each
  * micro-batch's per-key partial state ([[WalReplay.partialState]])
  * merges (⊎, [[WalReplay.mergeStates]]) into a versioned parquet
  * snapshot that any batch reader can load at any time.
  *
  * The ⊎ precondition (disjoint log slices) is exactly what
  * micro-batches give: each event belongs to one batch. Versioned
  * directories make the sink crash-safe without coordination — a
  * batch writes `v=<batchId>` next to the previous version and
  * readers take the highest _SUCCESS-marked version, so a torn write
  * leaves the prior state intact (the same publish discipline as the
  * reference's snapshot-then-update-lastSnapshotID ordering,
  * persistence.cc takeSnapshot).
  */
object StateSink {

  private def versionDirs(root: String): Seq[(Long, String)] = {
    val p = Paths.get(root)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val it = Files.list(p).iterator()
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      while (it.hasNext) {
        val d = it.next()
        val n = d.getFileName.toString
        if (n.startsWith("v=") && Files.exists(d.resolve("_SUCCESS")))
          out += ((n.stripPrefix("v=").toLong, d.toString))
      }
      out.toSeq.sortBy(_._1)
    }
  }

  /** Latest committed state, or None before the first batch. */
  def readState(s: SparkSession, root: String): Option[DataFrame] =
    versionDirs(root).lastOption.map { case (_, dir) => s.read.parquet(dir) }

  /** The foreachBatch function: fold this batch into the state.
    * Usage:
    * {{{
    * events.writeStream.foreachBatch(StateSink.update(spark, root) _)
    * }}}
    */
  def update(s: SparkSession, root: String)(batch: DataFrame,
                                            batchId: Long): Unit = {
    val partial = WalReplay.partialState(batch)
    // idempotent under foreachBatch's retry contract (same batchId
    // re-delivered after a failure): merge only versions STRICTLY
    // below this batchId, so a retry overwrites its own previous —
    // possibly committed — attempt instead of folding it in twice
    val prev = versionDirs(root).filter(_._1 < batchId).lastOption
    val merged = prev match {
      case Some((_, dir)) =>
        WalReplay.mergeStates(s.read.parquet(dir), partial)
      case None => partial
    }
    merged.write.mode("overwrite").parquet(s"$root/v=$batchId")
    // retain the newest version below this batch (the retry/crash
    // fallback) plus the one just written; older versions are
    // re-derivable from the log
    versionDirs(root).filter(_._1 < batchId).dropRight(1).foreach {
      case (_, dir) =>
        val d = Paths.get(dir)
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
    }
  }
}
