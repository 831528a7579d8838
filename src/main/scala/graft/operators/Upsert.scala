package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-writer-wins upsert — bulk form of the reference's
  * `VectorDatabase::upsert` (vector_database.cc:53: fetch old row,
  * remove from index, insert new row).
  *
  * In a columnar batch engine "remove old + insert new" collapses to
  * a per-key argmax on a version column. Implemented with `max_by`
  * aggregation rather than a `row_number` window: an aggregate gets
  * map-side partial aggregation (each shuffle partition emits one
  * candidate per key), while a window must shuffle and sort every
  * version of every key — the Delta-Lake MERGE shape, and the one
  * that holds up when replaying a 100 TB changelog.
  */
object Upsert {

  /** Keep, per `key`, the row with the greatest `version`.
    * `version` must be unique per key for deterministic output (the
    * reference has the same requirement: WAL log ids are monotonic).
    */
  def lastWriterWins(all: DataFrame, key: String, version: String): DataFrame = {
    val payloadCols = all.columns.filterNot(_ == key)
    val payload = struct(payloadCols.map(col).toIndexedSeq: _*)
    all.groupBy(col(key))
      .agg(max_by(payload, col(version)).as("_p"))
      .select(col(key) +: payloadCols.map(c => col(s"_p.$c").as(c)): _*)
  }

  /** Plain insert — the reference's `/insert` endpoint
    * (http_server.cc:19, insertHandler at :150) appends WITHOUT the
    * remove-old step, so a re-inserted id yields two live rows. In
    * bulk form that is a bare union: no dedup, no shuffle, nothing
    * but file appends at scale — which is exactly the semantic
    * difference from [[lastWriterWins]].
    */
  def append(base: DataFrame, inserts: DataFrame): DataFrame =
    base.unionByName(inserts)
}
