package graft

import graft.sources.WalSource
import org.apache.spark.sql.functions._

class WalSourceSpec extends SparkSuite {
  import spark.implicits._

  test("parse splits exactly three heads, JSON tail stays intact") {
    val lines = Seq(
      """42|7|upsert|{"id":9,"vectors":[0.5],"int_field":3,"indexType":"FLAT"}""",
      // a JSON payload containing '|' must not be split further
      """43|8|upsert|{"id":10,"note":"a|b","int_field":4}""").toDF("line")
    val p = WalSource.parse(lines).orderBy("log_id").collect()
    assert(p(0).getLong(0) == 42L && p(0).getLong(1) == 7L &&
      p(0).getString(2) == "upsert" && p(0).getLong(3) == 9L &&
      p(0).getLong(4) == 3L)
    assert(p(1).getLong(3) == 10L && p(1).getLong(4) == 4L)
  }

  test("corrupt lines are rejected, not parsed into a null-id group") {
    val lines = Seq(
      """42|7|upsert|{"id":9,"int_field":3}""",
      "garbage with no delimiters",
      """not_a_number|7|upsert|{"id":9,"int_field":3}""",
      """43|8|upsert|{"broken json""").toDF("line")
    val p = WalSource.parse(lines).collect()
    assert(p.length == 1 && p(0).getLong(0) == 42L,
      s"expected only the well-formed line, got ${p.length}")
  }

  test("replay applies LWW over the planted re-upserts") {
    val out = WalSource.replayQuery(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(out.length == total)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 7 == 0) {
        assert(r.getLong(2) == 2L && r.getLong(3) == 2L,
          s"id $id should carry the v2 re-upsert")
      } else {
        assert(r.getLong(2) == 1L && r.getLong(3) == 1L)
      }
    }
  }

  test("round-trips the reference upsert payload shape") {
    // the synthetic WAL carries the exact request fields the reference
    // accepts (test/filter_upsert/upsert.json): id, vectors,
    // int_field, indexType
    val line = WalSource.syntheticWal(spark, sf).head().getString(0)
    val json = line.split("\\|", 4)(3)
    assert(json.contains("\"id\"") && json.contains("\"vectors\"") &&
      json.contains("\"int_field\"") && json.contains("\"indexType\":\"FLAT\""))
  }
}
