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
