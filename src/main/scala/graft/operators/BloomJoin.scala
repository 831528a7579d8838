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

  /** MEASURED-vs-THEORY false-positive rate of a k-hash Bloom filter
    * — the calibration report an operator sizing runtime filters
    * actually needs (the LSH S-curve's sibling: trust the formula
    * because the engine reproduces it). The builtin
    * BloomFilterAggregate's bit layout is implementation-defined, so
    * the report builds the TEXTBOOK filter from the repo's
    * deterministic hash discipline — bit_j(key) =
    * md5_prefix60(j|key) mod m — which the oracle regenerates from
    * the identical strings. Members are the customer keys; probes
    * the same count of guaranteed-disjoint keys (member + 10^7).
    * One m=16384-bit array, k = 1..6 hash functions: bits-set count,
    * false-positive hits (a probe whose k bits are ALL set),
    * measured FPR, analytic (1-(1-1/m)^{kn})^k. 1-1/m is 1-2^-14,
    * an exact double, so both engines' pow chains agree to well
    * inside the 4dp rounding. Scale shape: the bit table is ≤ m rows
    * per k after distinct (m is the structure's bound and grows with
    * n by design — the §4 rule applied to a bounded structure);
    * probe checks are an equi-join on (k, bit), never a scan of the
    * member set.
    */
  def bloomFprReport(s: SparkSession, dir: String, m: Long = 16384L,
                     maxK: Int = 6): DataFrame = {
    import graft.functions.Md5Prefix60
    val mem = Tables.customer(s, dir).select(col("c_custkey").as("key"))
      .localCheckpoint(true)
    val js = s.range(0L, maxK.toLong).toDF()
      .select(col("id").as("j"))
    val ks = s.range(1L, maxK.toLong + 1).toDF()
      .select(col("id").as("k"))
    def bitOf(key: org.apache.spark.sql.Column,
              j: org.apache.spark.sql.Column) =
      pmod(Md5Prefix60(concat_ws("|", j, key)), lit(m))
    val bits = mem.crossJoin(broadcast(js))
      .select(col("j"), bitOf(col("key"), col("j")).as("bit"))
      .distinct()
    val bitsK = bits.crossJoin(broadcast(ks))
      .where(col("j") < col("k"))
      .select(col("k"), col("bit")).distinct()
      .localCheckpoint(true)
    val pb = mem.select((col("key") + 10000000L).as("key"))
      .crossJoin(broadcast(js))
      .select(col("key"), col("j"), bitOf(col("key"), col("j")).as("bit"))
      .crossJoin(broadcast(ks))
      .where(col("j") < col("k"))
    val fps = pb.join(bitsK, Seq("k", "bit"), "left_semi")
      .groupBy("k", "key").agg(count(lit(1)).as("nm"))
      .where(col("nm") === col("k"))
      .groupBy("k").agg(count(lit(1)).as("fp_hits"))
    val setBits = bitsK.groupBy("k").agg(count(lit(1)).as("n_bits_set"))
    val nb = mem.agg(count(lit(1)).as("n"))
    ks.join(setBits, Seq("k"), "left")
      .join(fps, Seq("k"), "left")
      .crossJoin(broadcast(nb))
      .select(col("k"), col("n").as("n_keys"),
        coalesce(col("n_bits_set"), lit(0L)).as("n_bits_set"),
        coalesce(col("fp_hits"), lit(0L)).as("fp_hits"),
        round(coalesce(col("fp_hits"), lit(0L)).cast("double")
          / col("n"), 4).as("measured_fpr"),
        round(pow(lit(1.0) - pow(lit(1.0 - 1.0 / m),
            col("k").cast("double") * col("n")),
          col("k").cast("double")), 4).as("theory_fpr"))
      .orderBy("k")
  }
}
