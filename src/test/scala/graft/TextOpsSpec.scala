package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSuite {

  test("langid scores are ratios in [0,1] and argmax is deterministic") {
    val out = TextOps.langId(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val scores = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(scores.forall(s => s >= 0.0 && s <= 1.0))
      val best = Seq(("en", r.getDouble(1)), ("de", r.getDouble(2)),
        ("fr", r.getDouble(3))).minBy { case (l, s) => (-s, l) }._1
      assert(r.getString(4) == best)
    }
  }

  test("quality metrics agree with a hand computation") {
    val row = TextOps.quality(spark, sf).where(col("doc_id") === 0).head()
    val text = Tables.documents(spark, sf)
      .where(col("doc_id") === 0).head().getAs[String]("text")
    val toks = text.split(" ")
    assert(row.getLong(1) == text.length)
    assert(row.getLong(2) == toks.length)
    assert(row.getLong(3) == toks.distinct.length)
  }

  test("token counts: bpe-ish segmentation of plain words = word count") {
    // word-salad text has only [a-z ]+, so both tokenizers agree
    val out = TextOps.tokenCounts(spark, sf)
      .where(col("ws_tokens") =!= col("bpe_tokens")).count()
    assert(out == 0)
  }

  test("fingerprint is stable and fp60 fits in a positive long") {
    val out = TextOps.fingerprint(spark, sf).collect()
    assert(out.forall(_.getLong(2) >= 0))
    assert(out.map(_.getString(1)).toSet.size == out.length ||
      out.length > out.map(_.getString(1)).toSet.size) // dups allowed
    val again = TextOps.fingerprint(spark, sf).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("chunking: window starts, lengths and short-doc edge are exact") {
    import spark.implicits._
    // 50 tokens, size 32, overlap 8 → stride 24 → starts 0,24,48 with
    // lengths 32,26,2; a 3-token doc yields exactly one short chunk
    val long = (0 until 50).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, long), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextOps.chunk(docs, size = 32, overlap = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.filter(_._1 == 1L).toSeq ==
      Seq((1L, 0L, 0L, 32L), (1L, 1L, 24L, 26L), (1L, 2L, 48L, 2L)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 3L)))
    // every token position is covered by at least one window
    val covered = out.filter(_._1 == 1L)
      .flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0L until 50L).toSet)
  }
}
