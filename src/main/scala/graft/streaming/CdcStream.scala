package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHANGE-DATA-CAPTURE as a streaming sink — the live twin of
  * `vdb_snapshot_diff` (operators/Upsert.snapshotDiff): the upsert/
  * tombstone log streams in, and each micro-batch emits the VALUE-
  * SEMANTICS diff (`added` / `deleted` / `changed`; version churn
  * with identical attrs ships nothing) between the pre-batch and
  * post-batch LWW states — the batch a downstream index delta, cache
  * invalidation, or replica sync actually consumes, produced
  * continuously instead of by diffing two full snapshots after the
  * fact. The reference can only ship whole snapshots
  * (persistence.cc takeSnapshot); production stores all grew a
  * change feed.
  *
  * State = the per-key LWW WINNER rows INCLUDING tombstone winners
  * (existence is decided at read time, exactly like
  * `lastWriterWinsTombstone` before its visibility filter) — bounded
  * by live-plus-tombstoned key cardinality, never log length; the
  * cross-batch fold is winners-of-winners (max_by is associative, so
  * waves fold like partitions — the mergeable-sketch property the
  * streaming family leans on throughout).
  *
  * Exactly-once: state versions publish through [[StateSink]]'s
  * stage + atomic-rename protocol (`v=<batchId>_<attempt>` dirs, a
  * published dir never mutated, merge folds only STRICTLY-lower
  * batchIds), so a re-delivered batch recomputes against the same
  * pre-batch state and its diff overwrite replaces its own previous
  * attempt — the diff stream carries each change exactly once.
  */
object CdcStream {

  /** Per-key max-version winner rows, tombstone winners retained. */
  private def winners(log: DataFrame, key: String,
                      version: String): DataFrame = {
    val payloadCols = log.columns.filterNot(_ == key)
    val payload = struct(payloadCols.map(col).toIndexedSeq: _*)
    log.groupBy(col(key))
      .agg(max_by(payload, col(version)).as("_p"))
      .select(col(key) +: payloadCols.map(c => col(s"_p.$c").as(c)): _*)
  }

  /** The value-semantics diff of two winner states — the same
    * classification as `Upsert.snapshotDiff`, factored over winner
    * tables instead of log slices (one key-partitioned full-outer
    * join; unchanged keys drop before any sort, so the output is
    * diff-sized).
    */
  def diffStates(prev: DataFrame, cur: DataFrame, key: String,
                 version: String, op: String,
                 attrs: Seq[String]): DataFrame = {
    def visible(st: DataFrame, tag: String) =
      st.where(col(op) =!= lit("delete"))
        .select(col(key) +:
          (attrs.map(c => col(c).as(s"${tag}_$c")) :+
            col(version).as(s"${tag}_version")): _*)
    val j = visible(prev, "old")
      .join(visible(cur, "new"), Seq(key), "full_outer")
    val attrsChanged = attrs.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    j.withColumn("change",
        when(col("old_version").isNull, lit("added"))
          .when(col("new_version").isNull, lit("deleted"))
          .when(attrsChanged, lit("changed")))
      .where(col("change").isNotNull)
  }

  /** The foreachBatch function. State versions live under
    * `root/state`, the change feed under `root/diff/batch=<id>`
    * (a directory per micro-batch — consumers tail by batch id).
    */
  def update(s: SparkSession, root: String, key: String, version: String,
             op: String, attrs: Seq[String])(batch: DataFrame,
                                             batchId: Long): Unit = {
    val stateRoot = Paths.get(root, "state").toString
    val bw = winners(batch, key, version)
    val versions = StateSink.versionDirs(stateRoot)
    // fold only STRICTLY lower batchIds — a re-delivered batch must
    // diff against the same pre-batch state as its first attempt
    val prev = versions.filter(_._1 < batchId).lastOption
      .map { case (_, _, dir) => s.read.parquet(dir).localCheckpoint(true) }
    val merged = prev match {
      case Some(p) => winners(p.unionByName(bw), key, version)
      case None => bw
    }
    // skip-if-unchanged (the reference's own persistence TODO,
    // doc/persistence.md "显式持久化时检查是否需要持久化"), in two
    // independent layers:
    //  1. STATE version: skipped only when the batch advances NO
    //     winner (empty batch, or every row loses LWW to the retained
    //     state) — then merged is byte-identical to prev. Version
    //     churn with identical attrs DOES publish: the version
    //     watermark is recovery metadata, and the next batch's diff
    //     must report old_version from the true latest write (pinned
    //     by CdcStreamSpec against the batch snapshotDiff).
    //  2. DIFF directory: skipped whenever the VALUE-semantics diff
    //     is empty — an absent feed dir is an empty change set to a
    //     tailing consumer, so churn ships nothing, as the diff
    //     contract promises.
    // Both skips are idempotent under redelivery: same prev + same
    // batch → the same (non-)advance and the same empty diff.
    // Version uniqueness per key is a HARD INPUT CONTRACT (r13,
    // ADVICE r12): the strict `>` gate means a batch row carrying the
    // SAME version as the retained winner but a DIFFERENT payload
    // would silently never publish or diff. Rather than trust the
    // contract blindly, the gate's own join detects that case and
    // FAILS LOUDLY — the writer has a broken version clock, and
    // dropping one of two conflicting writes unreported is silent
    // data loss. Same-version BYTE-IDENTICAL re-assertions remain a
    // legal no-op (redelivery, at-least-once sources). One
    // request-batch-sized agg job decides both flags.
    val advanced = prev match {
      case Some(p) =>
        val cmpCols = (attrs :+ op).distinct
        val pv = p.select(col(key) +: col(version).as("_pv") +:
          cmpCols.map(c => col(c).as(s"_p_$c")): _*)
        val conflict = cmpCols.map(c => !(col(c) <=> col(s"_p_$c")))
          .reduce(_ || _)
        val flags = bw.join(pv, Seq(key), "left")
          .agg(
            max(when(col("_pv").isNull || col(version) > col("_pv"), 1)
              .otherwise(0)).as("adv"),
            max(when(col(version) === col("_pv") && conflict, 1)
              .otherwise(0)).as("dup"))
          .collect().head
        require(flags.isNullAt(1) || flags.getInt(1) == 0,
          s"CdcStream: batch $batchId carries a row with the same " +
            s"$version as the retained state winner but a different " +
            "payload — versions must be unique per key (broken " +
            "writer clock); refusing to silently drop a conflicting " +
            "write")
        !flags.isNullAt(0) && flags.getInt(0) == 1
      case None => !bw.isEmpty
    }
    if (!advanced) return
    val published = merged.localCheckpoint(true)
    val prevState = prev.getOrElse(published.limit(0))
    val diff = diffStates(prevState, published, key, version, op, attrs)
      .localCheckpoint(true)
    val attempt = versions.filter(_._1 == batchId)
      .map(_._2).maxOption.getOrElse(-1L) + 1L
    val staging = Paths.get(stateRoot, s".staging-$batchId-$attempt")
    published.write.mode("overwrite").parquet(staging.toString)
    Files.createDirectories(Paths.get(stateRoot))
    Files.move(staging, Paths.get(stateRoot, s"v=${batchId}_$attempt"),
      StandardCopyOption.ATOMIC_MOVE)
    // emit this batch's change set; overwrite = a retry replaces its
    // own previous attempt's diff (computed from the same prev, so
    // content-identical — redelivery cannot double-ship a change)
    if (!diff.isEmpty)
      diff.write.mode("overwrite")
        .parquet(Paths.get(root, "diff", s"batch=$batchId").toString)
    val keep = StateSink.versionDirs(stateRoot).map(_._1)
      .distinct.sorted.takeRight(2).toSet
    StateSink.versionDirs(stateRoot).filterNot(v => keep(v._1))
      .foreach { case (_, _, dir) => StateSink.deleteTree(dir) }
  }

  /** Attach the CDC sink to a log stream. */
  def attach(log: DataFrame, root: String, key: String, version: String,
             op: String, attrs: Seq[String])
            (implicit s: SparkSession)
      : org.apache.spark.sql.streaming.StreamingQuery =
    log.writeStream
      .foreachBatch(update(s, root, key, version, op, attrs) _)
      .start()
}
