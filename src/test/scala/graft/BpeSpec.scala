package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSuite {

  /** Reference greedy-left BPE merge over a symbol sequence. */
  private def greedy(syms: List[String], a: String,
                     b: String): List[String] = syms match {
    case x :: y :: rest if x == a && y == b => (a + b) :: greedy(rest, a, b)
    case x :: rest => x :: greedy(rest, a, b)
    case Nil => Nil
  }

  private def viaColumn(syms: List[String], a: String, b: String): List[String] = {
    import spark.implicits._
    val rows = syms.zipWithIndex.map { case (s, i) => ("w", 1L, i, s) }
    Bpe.mergeRound(rows.toDF("word", "cnt", "pos", "s"), a, b)
      .orderBy("pos").collect().map(_.getString(3)).toList
  }

  test("parity-window rewrite equals greedy-left merge") {
    // back-to-back occurrences, a==b runs (the only symbol-sharing
    // overlap, where greedy must left-align: odd runs keep the
    // trailing singleton), and a substring-aliasing probe
    val cases = Seq(
      (List("a", "b", "a", "b", "a", "b"), "a", "b"),
      (List("x", "a", "b", "a", "b", "y"), "a", "b"),
      (List("a", "a", "a"), "a", "a"),
      (List("a", "a", "a", "a", "a"), "a", "a"),
      (List("da", "b", "a", "b"), "a", "b"), // no match inside "da b"
      (List("ab", "b", "a", "b"), "a", "b"))
    cases.foreach { case (syms, a, b) =>
      assert(viaColumn(syms, a, b) == greedy(syms, a, b),
        s"mismatch for $syms merging ($a,$b)")
    }
  }

  test("merge counts are non-increasing over rounds") {
    // any pair alive at round r+1 either existed at r (merging never
    // adds occurrences of an unrelated pair) or involves the new
    // symbol, whose occurrence count is the round-r merge count —
    // both bounded by round r's argmax
    val (merges, _) = Bpe.learn(spark, sf, 8)
    assert(merges.size == 8)
    val cnts = merges.map(_._4)
    assert(cnts.zip(cnts.tail).forall { case (x, y) => x >= y },
      s"counts increased: $cnts")
    assert(merges.map(_._1) == (1 to 8).toSeq)
  }

  test("tokenize fertility is bounded and merges shorten documents") {
    val out = Bpe.bpeTokenize(spark, sf, 8)
      .select("doc_id", "n_words", "n_bpe_tokens").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // every word is at least one token; chars upper-bound removed
      // tokens, so bpe tokens are at least words and at most chars
      assert(r.getLong(2) >= r.getLong(1))
    }
    // 8 merges must strictly shrink the corpus: total bpe tokens <
    // total chars-as-symbols (otherwise no merge ever applied)
    val totalBpe = out.map(_.getLong(2)).sum
    val totalChars = Tables.documents(spark, sf)
      .select(sum(length(regexp_replace(col("text"), " ", ""))))
      .collect().head.getLong(0)
    assert(totalBpe < totalChars, s"no merge applied: $totalBpe vs $totalChars")
  }
}
