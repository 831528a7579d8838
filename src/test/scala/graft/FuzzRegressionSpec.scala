package graft

import graft.operators.{Analytics, Multimodal, Sketch, TextOps}
import org.apache.spark.sql.functions._

/** In-suite pins for the r12 fuzz's crash-class fixes (§4c): the
  * seeded oracle fuzz found these end-to-end, but the suite must
  * defend them without running the fuzz. A tiny planted-nasty table
  * set is written once per run; each case asserts the documented
  * degenerate-row semantics instead of the pre-fix crash.
  */
class FuzzRegressionSpec extends SparkSuite {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "fuzzreg")
      .toString
    val docs = Seq(
      (1L, Option("the quick brown fox jumps over the lazy dog"),
        Option("en"), Option("web")),
      (2L, Option("der schnelle braune fuchs und der faule hund"),
        Option("de"), Option("web")),
      (3L, Option.empty[String], Option.empty[String], Option.empty[String]),
      (4L, Option(""), Option("en"), Option("web")),
      (5L, Option("   "), Option.empty[String], Option("web")),
      (6L, Option("emoji 😀🚀 mix"), Option("en"), Option("web")),
      (7L, Option("solo"), Option("en"), Option("web")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val t0 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    val ev = Seq(
      (1L, t0, 10L, "view", Option(5.0), Option("{}")),
      (2L, t0, 11L, "view", Option(7.5), Option("")),
      (3L, t0, 12L, "view", Option.empty[Double], Option.empty[String]),
      // constant-count series: one event per day for its own type
      (4L, t0, 13L, "flat", Option(1.0), Option("{}")),
      (5L, java.sql.Timestamp.valueOf("2024-01-06 10:00:00"), 13L,
        "flat", Option(1.0), Option("{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("NULL text decodes as an empty media payload, never an NPE") {
    val rows = Multimodal.decodeQuery(spark, dir).collect()
    assert(rows.length == 7)
    val nullDoc = rows.find(_.getLong(0) == 3L).get
    // empty payload → the 8×8 fixture raster
    assert(nullDoc.getLong(2) == 8L && nullDoc.getLong(3) == 8L)
  }

  test("char-mirror media ops restrict to single-byte non-empty docs") {
    val ids = Multimodal.featuresQuery(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // NULL (3), empty (4) and the emoji doc (6) are out of domain;
    // the whitespace doc is single-byte and stays
    assert(ids == Set(1L, 2L, 5L, 7L))
  }

  test("whitespace-only doc: zero bpe tokens yields NULL ratio, no 0-div") {
    val r = TextOps.tokenCounts(spark, dir)
      .where(col("doc_id") === 5L).collect().head
    assert(r.getLong(2) == 0L && r.isNullAt(3))
  }

  test("one-token docs contribute no bigrams and never index toks[-1]") {
    // pre-fix: sequence(0, -1) descended and threw INVALID_ARRAY_INDEX
    TextOps.collocations(spark, dir, minCount = 1L).collect()
  }

  test("zero-variance daily series yields no z-score, never a 0-div") {
    val out = Analytics.eventsAnomaly(spark, dir).collect()
    assert(!out.exists(_.getString(0) == "flat"))
  }

  test("NULL values carry no histogram bin") {
    import spark.implicits._
    val df = Seq(("a", java.lang.Long.valueOf(10L)),
      ("a", java.lang.Long.valueOf(200L)),
      ("a", null.asInstanceOf[java.lang.Long]))
      .toDF("grp", "v")
    val bins = Sketch.histBinCounts(df, "grp", "v", 64)
    assert(bins.where(col("bin").isNull).isEmpty)
    assert(bins.agg(sum("cnt")).head.getLong(0) == 2L)
  }

  test("NULL text is not a corpus member for chunking or language ID") {
    assert(TextOps.chunk(Tables.documents(spark, dir))
      .where(col("doc_id") === 3L).isEmpty)
    val pred = TextOps.langId(spark, dir)
      .where(col("doc_id") === 3L).collect().head
    assert(pred.isNullAt(4), "NULL-text doc must stay unclassified")
  }

  test("out-of-domain magnitudes fail LOUD, never corrupt silently") {
    import spark.implicits._
    val d2 = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "fuzzdom")
      .toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    // |value| = 1e12 → micro 1e14, m⁴ = 1e56 > DECIMAL(38,0)
    Seq((1L, t0, 1L, "x", Option(1e12), Option("{}")),
      (2L, t0, 2L, "x", Option(2e12), Option("{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d2/events.parquet")
    intercept[Exception] {
      Analytics.eventsMoments(spark, d2).collect()
    }
  }
}
