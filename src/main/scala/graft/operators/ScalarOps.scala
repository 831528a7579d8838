package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar-side operators: point lookup + filter-index summary.
  *
  * Reference analogs: `ScalarStorage::get_scalar` (RocksDB point get,
  * scalar_storage.cc:34 via the /query endpoint) and
  * `FilterIndex::addIntFieldFilter` (per-value roaring bitmaps,
  * filter_index.cc:21).
  */
object ScalarOps {

  /** query(id): an IN-list predicate that pushes down to the parquet
    * scan — the columnar replacement for a KV point get. At cluster
    * scale this prunes row groups / partitions instead of touching a
    * secondary index.
    */
  def pointLookup(df: DataFrame, idCol: String, ids: Seq[Long]): DataFrame =
    df.where(col(idCol).isin(ids: _*))

  /** The filter index *as data*: per (field, value) the bitmap
    * cardinality and id range. The bitmap itself is unnecessary in
    * Spark — `=`/`!=` predicates push to the scan (see Knn) — but the
    * summary is the observable equivalent of
    * FilterIndex::serializeIntFieldFilter.
    */
  def filterIndexBuild(df: DataFrame, field: String, idCol: String): DataFrame =
    df.groupBy(col(field))
      .agg(
        count(lit(1)).as("card"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))
      .orderBy(col(field))

  /** EQUAL / NOT_EQUAL bitmap as a predicate (FilterIndex::Operation). */
  def filterPredicate(field: String, equal: Boolean, value: Long): Column =
    if (equal) col(field) === value else col(field) =!= value

  /** Bulk remove-by-id — the reference's `FaissIndex::remove_vectors`
    * (faiss_index.cc, invoked by upsert's remove-old step) as a
    * left_anti join: the surviving table without the removed ids.
    * An anti join against a small id set broadcasts; against a
    * removal LOG it is a shuffle join on the id — either way no row
    * of the corpus is rewritten, which is the columnar advantage
    * over an in-place index mutation.
    */
  def removeByIds(df: DataFrame, idCol: String, removed: DataFrame,
                  removedIdCol: String): DataFrame =
    df.join(removed.select(col(removedIdCol).as("__rm_id")),
      col(idCol) === col("__rm_id"), "left_anti")
}
