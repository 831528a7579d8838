package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Spark-first equivalent of the reference's storage layer: the
  * columnar parquet scan replaces ScalarStorage (RocksDB KV,
  * reference scalar_storage.cc) — predicate/projection pushdown gives
  * point lookups and scans without a secondary index.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The driver's test files are single-row-group parquet, so a bare
    * scan is ONE task and every per-row expression runs on one core.
    * A production corpus arrives in thousands of splits; this models
    * that by spreading rows across the session's cores right after
    * the scan. Catalyst still pushes filters/pruning through the
    * Repartition node to the scan, and the shuffle moves only the
    * pruned columns — at real scale the input is already split and
    * the repartition collapses to a no-op cost-wise relative to the
    * expression work it parallelizes.
    *
    * Spreading HASHES ON THE TABLE'S NATURAL KEY rather than
    * round-robin: downstream windows/aggregations keyed the same way
    * (sessionize by user_id, shingling by doc_id) then satisfy their
    * distribution requirement from this exchange instead of adding a
    * second one — the same reason production tables are bucketed by
    * their join key.
    */
  private def spread(s: SparkSession, df: DataFrame, key: String): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism, col(key))

  def lineitem(s: SparkSession, d: String): DataFrame =
    spread(s, table(s, d, "lineitem"), "l_orderkey")
  def orders(s: SparkSession, d: String): DataFrame =
    spread(s, table(s, d, "orders"), "o_orderkey")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright; read the raw int64 nanos and floor-divide
    * to microseconds (the driver data has no sub-microsecond residue).
    *
    * CONTRACT: requires `spark.sql.legacy.parquet.nanosAsLong=true`,
    * which [[GraftSession.builder]] sets at session build time — this
    * is a session-wide read-behavior flag affecting every
    * nanos-timestamp parquet read, so it is NOT set here as a loader
    * side effect. Sessions not built via GraftSession must set it
    * themselves (the loader fails fast with Spark's reader error
    * otherwise, never silently misreads).
    */
  def events(s: SparkSession, d: String): DataFrame =
    spread(s, table(s, d, "events"), "user_id")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame =
    spread(s, table(s, d, "documents"), "doc_id")
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(s, table(s, d, "embeddings"), "vec_id")
}
