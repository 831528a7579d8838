package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSuite {

  private def dim = Tables.orders(spark, sf)
    .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
      col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    .select(col("o_orderkey"), col("o_orderpriority"))

  test("no false negatives: every dim key passes the filter") {
    val bloom = BloomJoin.bloomBytes(dim, "o_orderkey", dim.count())
    val dropped = dim
      .where(!BloomJoin.mightContain(bloom, col("o_orderkey")))
      .count()
    assert(dropped == 0, s"bloom dropped $dropped present keys")
  }

  test("prefilter prunes most non-joining fact rows pre-exchange") {
    val bloom = BloomJoin.bloomBytes(dim, "o_orderkey", dim.count())
    val fact = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val total = fact.count()
    val pass = fact
      .where(BloomJoin.mightContain(bloom, col("l_orderkey"))).count()
    val matching = fact
      .join(dim.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    // sandwich: no false negatives below, real pruning above — the
    // pass-through must sit near the true match count, far under the
    // fact count (dim selects ~1/7 of orders)
    assert(pass >= matching, s"bloom lost matches: $pass < $matching")
    assert(pass <= total / 2,
      s"bloom pruned nothing: $pass of $total passed")
    assert(pass <= (matching * 1.1).toLong + 100,
      s"false-positive rate collapsed: $pass vs $matching matches")
  }

  test("empty dim side: prefilter still equals the (empty) plain join") {
    val none = dim.where(lit(false))
    val bloom = BloomJoin.bloomBytes(none, "o_orderkey", 1L)
    val kept = Tables.lineitem(spark, sf)
      .where(BloomJoin.mightContain(bloom, col("l_orderkey"))).count()
    val plain = Tables.lineitem(spark, sf)
      .join(none, col("l_orderkey") === col("o_orderkey")).count()
    assert(plain == 0)
    // an all-pass prefilter here would still be CORRECT (the join
    // removes everything) but would prune nothing; the aggregate's
    // empty-state bloom must reject, not admit
    assert(kept == 0, s"empty-dim bloom admitted $kept fact rows")
  }

  test("prefiltered join ≡ plain join, and the plan carries the filter") {
    val viaBloom = BloomJoin.bloomQuery(spark, sf)
    val plain = Tables.lineitem(spark, sf)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
    assert(viaBloom.collect().toSeq == plain.collect().toSeq)
    val physical = viaBloom.queryExecution.executedPlan.toString
    assert(physical.contains("might_contain"),
      "bloom prefilter missing from the physical plan")
  }
}
