package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered join — the runtime-filter pattern that pays for
  * itself at 100 TB: when the dim side of a fact⋈dim join is made
  * selective by a predicate, a plain shuffle join still exchanges
  * EVERY fact row, though most find no partner. Building a Bloom
  * filter over the filtered dim's join keys (KB–MB, request-sized)
  * and applying `might_contain` at the fact scan drops non-joining
  * rows BEFORE the exchange — the shuffle then carries roughly the
  * join's output cardinality instead of the fact's.
  *
  * This is exactly what Spark's own `InjectRuntimeFilter` rule
  * automates for shuffle joins inside its size/selectivity
  * thresholds; the explicit form works wherever the operator knows
  * the dim is selective — across the thresholds, under AQE re-plans,
  * and with the filter's capacity sized from the dim's actual count
  * rather than a global default. No false negatives (a Bloom filter
  * never drops a present key), and false positives are removed by
  * the join itself, so the result is EQUAL to the plain join — which
  * is the oracle.
  */
object BloomJoin {

  /** Serialized Bloom filter over `xxhash64(key)` of the dim side.
    * One partial-aggregated pass over the (already filtered) dim;
    * the bytes are driver-held and literal-embedded, like IVF
    * centroids — request-sized state, never data-sized.
    */
  def bloomBytes(dim: DataFrame, key: String,
                 expectedItems: Long): Array[Byte] =
    dim.select(GraftColumnBridge.column(
        new BloomFilterAggregate(
          GraftColumnBridge.expression(xxhash64(col(key))), expectedItems)
          .toAggregateExpression()).as("bf"))
      .collect().head.getAs[Array[Byte]](0)

  /** `might_contain(bloom, xxhash64(key))` as a Column — a codegen
    * builtin (the same expression the optimizer's runtime filter
    * injects), so the prefilter rides inside the scan's
    * whole-stage-codegen pass.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftColumnBridge.expression(xxhash64(key))))

  /** 1996-ordered revenue by priority: lineitem⋈(orders in 1996).
    * The fact scan carries the dim-derived Bloom prefilter, so only
    * ~1/7 of lineitem rows reach the join exchange; result ≡ the
    * plain join (oracled).
    */
  def bloomQuery(s: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: the filtered dim feeds THREE consumers (the
    // count that sizes the filter, the Bloom-building aggregate, and
    // the join build side) — without it each consumer re-runs the
    // orders scan. Materialized it is filtered-dim-sized, the same
    // bound the join's build side already pays.
    val dim = Tables.orders(s, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderpriority"))
      .localCheckpoint()
    val bloom = bloomBytes(dim, "o_orderkey", math.max(dim.count(), 1L))
    val fact = Tables.lineitem(s, dir)
      .where(mightContain(bloom, col("l_orderkey")))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }
}
