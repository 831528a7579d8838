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

  test("chunk_pack: sequences partition a doc's chunks by offset") {
    import spark.implicits._
    // 200 tokens, size 32/overlap 8 → 9 chunks at starts 0,24,…,192;
    // budget 128: cum-before offsets 0,32,64,96,128,… so chunks 0-3
    // land in seq 0 (128 toks), the rest spill into seqs 1-2
    val docs = Seq((1L, (0 until 200).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.chunkPack(docs, 32, 8, 128).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._2).sum == 9, "chunks lost or duplicated in packing")
    assert(out.head == (0L, 4L, 128L), s"first sequence was ${out.head}")
    // sequence ids are dense from 0 and token sums stay near budget
    assert(out.map(_._1).toSeq == out.indices.map(_.toLong))
  }

  test("pii: counts match planted positives and redaction removes them") {
    val out = TextOps.piiQuery(spark, sf).collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 10 == 0) 1L else 0L), s"emails @$id")
      assert(r.getLong(2) == (if (id % 7 == 0) 2L else 0L), s"phones @$id")
      assert(r.getLong(3) == (if (id % 13 == 0) 1L else 0L), s"ips @$id")
      assert(r.getLong(5) == r.getLong(1) + r.getLong(2) + r.getLong(3))
    }
    // redaction is idempotent: a second pass finds nothing to count
    import spark.implicits._
    val redacted = Seq(("x y user3@example.com 555-123-4567 10.0.0.1"))
      .toDF("text").select(
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "[EMAIL]"),
          "[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
          "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "[IP]"))
      .collect().head.getString(0)
    assert(redacted == "x y [EMAIL] [PHONE] [IP]")
  }

  test("repetition signals match a hand computation") {
    import spark.implicits._
    // "a b a b a": unigrams a×3 b×2 → top 3/5; bigrams "a b"×2
    // "b a"×2 → top 2/4; trigrams "a b a"×2 "b a b"×1 → dup 2/3
    val docs = Seq((1L, "a b a b a"), (2L, "x")).toDF("doc_id", "text")
    val byId = TextOps.repetitionOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = byId(1L)
    assert(r1.getLong(1) == 5L)
    assert(r1.getDouble(2) == 0.6)
    assert(r1.getDouble(3) == 0.5)
    assert(r1.getDouble(4) == 0.6667)
    // single-token doc: no bigrams/trigrams → NULL fractions
    val r2 = byId(2L)
    assert(r2.getLong(1) == 1L && r2.getDouble(2) == 1.0)
    assert(r2.isNullAt(3) && r2.isNullAt(4))
  }

  test("surprisal: bin-length identity is exact floor(log2)") {
    import spark.implicits._
    // the integer path length(bin(x))−1 must agree with floor(log2 x)
    // everywhere, INCLUDING the power-of-two boundaries where a float
    // log2 can land a last-ulp below the integer
    val got = (1L to 4096L).toDF("x")
      .select(col("x"), (length(bin(col("x"))) - 1).as("bits"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (1L to 4096L).foreach { x =>
      val exact = 63 - java.lang.Long.numberOfLeadingZeros(x)
      assert(got(x) == exact, s"x=$x: ${got(x)} != $exact")
    }
  }

  test("surprisal: corpus scores reconcile with the unigram model") {
    val out = TextOps.surprisal(spark, sf).collect()
    // hand-build the model once on the driver (sf0.001 corpus is
    // ~500 short docs) and reconcile every doc's integer sums
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val cnt = docs.flatMap(_._2).groupBy(identity).map { case (t, o) =>
      (t, o.length.toLong) }
    val total = cnt.values.sum
    val expect = docs.map { case (id, toks) =>
      val bits = toks.map(t =>
        (63 - java.lang.Long.numberOfLeadingZeros(total / cnt(t))).toLong).sum
      id -> ((toks.length.toLong, bits))
    }.toMap
    assert(out.length == docs.length)
    out.foreach { r =>
      val (n, b) = expect(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == b,
        s"doc ${r.getLong(0)}: (${r.getLong(1)},${r.getLong(2)}) != ($n,$b)")
      assert(math.abs(r.getDouble(3) - b.toDouble / n) < 5e-5)
    }
  }
}
