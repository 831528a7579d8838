package graft

import org.apache.spark.sql.functions._

/** Pins for the r16 optimization restructures that changed operator
  * internals (the round rule: an optimization that rewrites an
  * operator's plan carries a focused equality test beside the oracle).
  */
class R16OptSpec extends SparkSuite {

  /** Independent driver-side ABC reference: global revenue-descending
    * order (cents desc, partkey asc — exactly the order the banded
    * two-level rank reproduces distributively), cumulative share
    * thresholds 80/95 in exact integer arithmetic.
    */
  private def abcRef(parts: Seq[(Long, Long)]): Map[Long, String] = {
    val pos = parts.filter(_._2 > 0)
    val total = pos.map(_._2).sum
    var acc = 0L
    pos.sortBy { case (pk, c) => (-c, pk) }.map { case (pk, c) =>
      acc += c
      val cls = if (acc * 5 <= total * 4) "A"
        else if (acc * 20 <= total * 19) "B" else "C"
      pk -> cls
    }.toMap
  }

  test("partAbcMigration (r16 single-pass) matches the independent " +
    "two-half ABC reference") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"),
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) " +
          "AS BIGINT)").as("cents"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("d")),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_partkey", "cents", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (li.map(_._3).min + li.map(_._3).max) / 2
    def revOf(post: Boolean): Seq[(Long, Long)] =
      li.filter(r => if (post) r._3 >= mid else r._3 < mid)
        .groupBy(_._1).map { case (pk, rs) => (pk, rs.map(_._2).sum) }
        .toSeq
    val c0 = abcRef(revOf(post = false))
    val c1 = abcRef(revOf(post = true))
    val expected = (c0.keySet ++ c1.keySet).toSeq
      .map(pk => (c0.getOrElse(pk, "-"), c1.getOrElse(pk, "-")))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = operators.Analytics.partAbcMigration(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }
}
