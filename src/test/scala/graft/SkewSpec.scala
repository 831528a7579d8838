package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals the plain join, row for row") {
    val probe = (1L to 500L).map(i => (i, i % 7, i * 0.5)).toDF("id", "k", "v")
    val build = (0L to 6L).map(i => (i, s"dim$i")).toDF("k", "name")
    val salted = Skew.saltedJoin(probe, build, "k", "id", 8)
      .select("id", "k", "v", "name").collect().toSet
    val plain = probe.join(build, "k")
      .select("id", "k", "v", "name").collect().toSet
    assert(salted == plain && salted.size == 500)
  }

  test("salted join keys on (key, salt) and replicates the build side") {
    val probe = (1L to 100L).map(i => (i, i % 3)).toDF("id", "k")
    val build = (0L to 2L).map(i => (i, i * 10)).toDF("k", "w")
    val p = Skew.saltedJoin(probe, build, "k", "id", 4)
      .queryExecution.optimizedPlan.toString
    val joins = p.linesIterator.filter(_.contains("Join")).mkString("\n")
    assert(joins.contains("_salt"), s"join not salted:\n$joins")
    assert(p.contains("explode"), s"build side not replicated:\n$p")
  }

  test("whale basket: a 10^4-frequent-item customer stays <= C^2 pairs") {
    // the basket_pairs/part_item_cf skew guard: one reseller/bot
    // account holding 10,000 frequent parts must NOT fan out
    // quadratically in the cust-keyed self-join — the per-customer
    // top-C cap bounds it at C·(C−1)/2 pairs, and normal baskets
    // pass through untouched
    val cap = 64
    val whale = (1L to 10000L).map(p => (1L, p))
    val normal = (2L to 5L).flatMap(c => (1L to 10L).map(p => (c, p)))
    val baskets = (whale ++ normal).toDF("cust", "part")
    val freq = baskets.groupBy("part")
      .agg(count(lit(1)).as("n")) // every part "frequent" for the test
    val capped = graft.operators.Analytics
      .capFrequentPerBasket(baskets, freq, cap)
    val perCust = capped.groupBy("cust").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perCust(1L) == cap.toLong,
      s"whale not capped: ${perCust(1L)} items survived")
    (2L to 5L).foreach(c => assert(perCust(c) == 10L,
      s"normal basket $c was truncated to ${perCust(c)}"))
    // the pair expansion off the capped table is bounded per cust
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.cust") === col("b.cust") && col("a.part") < col("b.part"))
      .groupBy(col("a.cust")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs(1L) == cap.toLong * (cap - 1) / 2,
      s"whale pair fan-out ${pairs(1L)} != C(C-1)/2")
    // determinism: the kept items are the support-then-id prefix
    val kept = capped.where(col("cust") === 1L).select("part")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == (1L to cap.toLong),
      "cap tiebreak not (support desc, part asc)")
  }

  test("hot-key rows spread across salt values") {
    // one key owns 90% of the probe side — the skew scenario
    val probe = ((1L to 900L).map(i => (i, 1L)) ++
      (901L to 1000L).map(i => (i, i % 5))).toDF("id", "k")
    val salts = probe
      .withColumn("_salt", pmod(hash(col("id")), lit(8)))
      .where(col("k") === 1L)
      .groupBy("_salt").count().collect()
    assert(salts.length == 8, "hot key not spread over all salts")
    assert(salts.map(_.getLong(1)).max < 900,
      "one salt still owns the hot key")
  }
}
