package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's on-disk WAL as a Spark SOURCE.
  *
  * Line format (reference persistence.cc:59 writeWALLog):
  * {{{ log_id|version|operation_type|json }}}
  * with the json payload carrying the upsert request shape
  * `{id, vectors:[...], int_field, indexType}`
  * (reference test/filter_upsert/upsert.json, http_server.cc).
  *
  * `parse` is the bulk twin of readNextWALLog
  * (persistence.cc:84: three '|'-delimited heads, JSON tail):
  * a columnar split + `get_json_object`, all codegen'd — a 100 TB WAL
  * ingests as an ordinary distributed text scan, and replay is the
  * same LWW aggregation the upsert operator uses (no driver loop).
  */
object WalSource {

  /** Leading `log_id` of a record line, None when garbled — the
    * driver-side twin of `parse`'s try_cast head (used by vacuum,
    * where a corrupt line must make its segment IMMORTAL, never
    * silently deletable).
    */
  def headLogId(line: String): Option[Long] = {
    val i = line.indexOf('|')
    if (i <= 0) None
    else
      try Some(line.substring(0, i).toLong)
      catch { case _: NumberFormatException => None }
  }

  /** Deterministic synthetic WAL over the embeddings table: every
    * vector upserted at version 1, every 7th re-upserted at version 2
    * with a shifted int_field — same plant pattern the vdb_upsert
    * query uses, now routed through the textual WAL format.
    */
  def syntheticWal(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    def line(logId: org.apache.spark.sql.Column,
             version: org.apache.spark.sql.Column,
             intField: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat_ws("|",
        logId.cast("string"), version.cast("string"), lit("upsert"),
        to_json(struct(
          col("vec_id").as("id"),
          col("embedding").as("vectors"),
          intField.as("int_field"),
          lit("FLAT").as("indexType"))))
    val base = e.select(
      line(col("vec_id"), lit(1L), col("label").cast("long")).as("line"))
    val upd = e.where(col("vec_id") % 7 === 0).select(
      line(col("vec_id") + 100000L, lit(2L),
        (col("label") + 100).cast("long")).as("line"))
    base.unionByName(upd)
  }

  /** Parse WAL lines into columns. The split is bounded at 4 so a
    * JSON payload containing '|' stays intact — same contract as the
    * reference's three getline('|') calls with the rest as JSON.
    */
  def parse(lines: DataFrame): DataFrame =
    lines
      .withColumn("p", split(col("line"), "\\|", 4))
      // try_* forms: under ANSI (Spark 4 default) a garbled line would
      // otherwise ABORT the whole replay job on one bad cast /
      // short split; try_cast maps it to null instead
      .select(
        try_element_at(col("p"), lit(1)).try_cast("long").as("log_id"),
        try_element_at(col("p"), lit(2)).try_cast("long").as("version"),
        try_element_at(col("p"), lit(3)).as("op"),
        get_json_object(try_element_at(col("p"), lit(4)), "$.id")
          .try_cast("long").as("id"),
        get_json_object(try_element_at(col("p"), lit(4)), "$.int_field")
          .try_cast("long").as("int_field"))
      // ... and the null heads are then rejected as corrupt — the
      // reference reader validates per record (persistence.cc:90
      // readNextWALLog bails on a short/garbled frame); a null-id
      // group reaching replay would silently fabricate a bogus state
      // row
      // id is required only for ops that carry a payload id — a valid
      // admin record with no $.id (e.g. a flush/snapshot marker) is
      // not corruption
      .where(col("log_id").isNotNull && col("version").isNotNull &&
        col("op").isNotNull &&
        !(col("op").isin("upsert", "delete") && col("id").isNull))

  /** Replay: last-writer-wins by (version, log_id) per id — the bulk
    * form of reloadDatabase's sequential apply loop
    * (reference vector_database.cc:21).
    */
  def replay(parsed: DataFrame): DataFrame =
    parsed
      .where(col("op") === "upsert")
      .groupBy("id")
      .agg(
        max_by(struct(col("int_field"), col("version")),
          struct(col("version"), col("log_id"))).as("w"),
        count(lit(1)).as("n_log_entries"))
      .select(col("id"), col("w.int_field").as("int_field"),
        col("w.version").as("version"), col("n_log_entries"))
      .orderBy("id")

  def replayQuery(s: SparkSession, dir: String): DataFrame =
    replay(parse(syntheticWal(s, dir)))

  /** [[syntheticWal]] extended with a DELETE optype — the WAL record
    * the reference's framing could carry but its server never writes
    * (persistence.cc parses `optype` generically; http_server.cc
    * offers no delete endpoint): a v3 tombstone wave for ids %5
    * (`log_id|3|delete|{"id":N}`) and a v4 re-upsert wave for ids
    * %15 (resurrection — a subset of the deleted).
    */
  def syntheticWalWithDeletes(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val dels = e.where(col("vec_id") % 5 === 0).select(
      concat_ws("|",
        (col("vec_id") + 200000L).cast("string"), lit("3"), lit("delete"),
        to_json(struct(col("vec_id").as("id")))).as("line"))
    val res = e.where(col("vec_id") % 15 === 0).select(
      concat_ws("|",
        (col("vec_id") + 300000L).cast("string"), lit("4"), lit("upsert"),
        to_json(struct(
          col("vec_id").as("id"),
          col("embedding").as("vectors"),
          (col("label") + 500).cast("long").as("int_field"),
          lit("FLAT").as("indexType")))).as("line"))
    syntheticWal(s, dir).unionByName(dels).unionByName(res)
  }

  /** Tombstone-honoring replay: ONE LWW pass over upserts AND
    * deletes — the per-id winner by (version, log_id) decides both
    * value and existence; a tombstone winner erases the id, a later
    * upsert resurrects it. `n_log_entries` counts every record that
    * mentioned the id, tombstones included (the replay-cost metric).
    * Same single aggregation exchange as [[replay]].
    */
  def replayTombstones(parsed: DataFrame): DataFrame =
    parsed
      .where(col("op").isin("upsert", "delete"))
      .groupBy("id")
      .agg(
        max_by(struct(col("int_field"), col("version"), col("op")),
          struct(col("version"), col("log_id"))).as("w"),
        count(lit(1)).as("n_log_entries"))
      .where(col("w.op") =!= "delete")
      .select(col("id"), col("w.int_field").as("int_field"),
        col("w.version").as("version"), col("n_log_entries"))
      .orderBy("id")

  def deleteReplayQuery(s: SparkSession, dir: String): DataFrame =
    replayTombstones(parse(syntheticWalWithDeletes(s, dir)))

  /** Rotated text WAL segments on disk, read back in BATCH via
    * `spark.read.text` — the storage-backed twin of
    * FileStreamWalSpec's `readStream.text` pipeline, under the same
    * oracle as [[replayQuery]] (same log, physical file route).
    */
  def fileReplayQuery(s: SparkSession, dir: String): DataFrame = {
    val seg = materializedTextWal(s, dir)
    replay(parse(s.read.text(seg).select(col("value").as("line"))))
  }

  /** Fixture synthesis: two text segment files (a rotated log), once
    * per sf dir. The `_done` marker is skipped by Spark's file index
    * (leading underscore), so readers only ever see whole segments.
    */
  private def materializedTextWal(s: SparkSession, dir: String): String = {
    val root = graft.IndexCache.dirFor(dir, "waltxt")
    val done = root.resolve("_done")
    if (!java.nio.file.Files.exists(done)) {
      java.nio.file.Files.createDirectories(root)
      val lines = syntheticWal(s, dir).collect().map(_.getString(0))
        .sortBy(_.split("\\|", 2)(0).toLong)
      val (a, b) = lines.splitAt(lines.length / 2)
      java.nio.file.Files.write(root.resolve("wal-000.log"),
        a.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.write(root.resolve("wal-001.log"),
        b.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.write(done, Array.emptyByteArray)
    }
    root.toString
  }
}
