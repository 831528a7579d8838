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
  /** ORDER-BY SCROLL (r13 — Qdrant's scroll with `order_by` on a
    * payload field: browse the collection by an attribute, not by
    * similarity): page 2 of points ordered by (label DESC, id) via a
    * KEYSET cursor — page 1's last (label, id) becomes a pushed-down
    * range predicate, so a page costs one bounded TakeOrdered pass
    * and never OFFSET-buffers the rows it skips (the scroll_page2
    * contract, on the payload axis). The page-local rank window runs
    * over pageSize rows by construction — bounded however big the
    * corpus. NULLS LAST explicit on both engines (the fuzz's
    * NULL-ordering divergence class). At 100 TB the order field is
    * the layout's sort/Z-order key, so the keyset predicate prunes
    * row groups exactly like the point lookup below.
    */
  def scrollOrderBy(s: org.apache.spark.sql.SparkSession, dir: String,
                    pageSize: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = graft.Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("label").cast("long").as("label"))
    val page1 = e.orderBy(col("label").desc_nulls_last, col("id"))
      .limit(pageSize).collect()
    // keyset cursor = page 1's last row in page order
    val last = page1.sortBy(r => (-r.getLong(1), r.getLong(0))).last
    val (cl, ci) = (last.getLong(1), last.getLong(0))
    val page2 = e.where(col("label") < cl ||
        (col("label") === cl && col("id") > ci))
      .orderBy(col("label").desc_nulls_last, col("id")).limit(pageSize)
    val w = Window.orderBy(col("label").desc_nulls_last, col("id"))
    page2.withColumn("rk", row_number().over(w) + pageSize)
      .select(col("rk"), col("id"), col("label"))
      .orderBy("rk")
  }

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

  /** FACET COUNTS (r13 — the collection-level facet API: Qdrant's
    * POST /collections/{c}/facet, Milvus' query with count
    * aggregation): for each facet key, the distinct payload values
    * among points matching the filter, with their exact counts — top
    * `limit` values per key by (count desc, value asc). This is NOT
    * [[Search.searchFacets]]: that one facets a Q×k RESULT set; this
    * aggregates the filtered COLLECTION, the "what's in here" browse
    * panel drawn before any query runs. Plan: filter (pushed to the
    * scan) → one union of per-key projections → partial-aggregating
    * groupBy — at 100 TB each map task pre-combines to its distinct
    * facet values, so the exchange carries value-cardinality rows,
    * not corpus rows, and the rank window runs over that same tiny
    * aggregate. NULL payload values are absent from facets (both
    * engines: a point without the key contributes nothing).
    */
  def facetCounts(base: DataFrame, filter: Column,
                  facetKeys: Seq[String], limit: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = base.where(filter)
    val u = facetKeys.map(k =>
        f.select(lit(k).as("facet"), col(k).cast("string").as("value")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy("facet")
      .orderBy(col("n").desc, col("value"))
    u.where(col("value").isNotNull)
      .groupBy("facet", "value").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= limit)
      .select(col("facet"), col("rk"), col("value"), col("n"))
      .orderBy("facet", "rk")
  }
}
