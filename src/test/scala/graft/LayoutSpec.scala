package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {

  test("bucketed join runs without an exchange on either input") {
    val (ot, lt) = Layout.ensureBucketedTables(spark, sf)
    // force a sort-merge join so the distribution requirement is
    // visible (a broadcast join needs no exchange regardless and
    // would make the assertion vacuous)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = spark.table(lt)
        .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a SMJ:\n${plan.take(1500)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(2500)}")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan ignores bucket layout:\n${plan.take(2500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed results equal the plain-layout join") {
    val got = Layout.bucketedJoinQuery(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == plain)
  }
}
