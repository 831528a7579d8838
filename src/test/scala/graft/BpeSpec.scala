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

  test("parity-window rewrite equals greedy-left on seeded random " +
    "sequences, every pair over a 3-symbol alphabet") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("a", "b", "c")
    for (pa <- alphabet; pb <- alphabet) {
      // 20 random words per pair, rewritten in ONE job (the word
      // partition isolates cases), checked against the sequential
      // reference — covers a==b runs and boundary overlaps far past
      // the hand-picked cases above
      val cs = (1 to 20).map { i =>
        (s"w$i", List.fill(2 + rnd.nextInt(10))(alphabet(rnd.nextInt(3))))
      }
      val rows = cs.flatMap { case (w, syms) =>
        syms.zipWithIndex.map { case (s0, i) => (w, 1L, i, s0) } }
      val out = Bpe.mergeRound(rows.toDF("word", "cnt", "pos", "s"), pa, pb)
        .collect().map(r => (r.getString(0), r.getInt(2), r.getString(3)))
        .groupBy(_._1).map { case (w, xs) =>
          w -> xs.sortBy(_._2).map(_._3).toList }
      cs.foreach { case (w, syms) =>
        assert(out.getOrElse(w, Nil) == greedy(syms, pa, pb),
          s"$w $syms merging ($pa,$pb)")
      }
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

  test("batched training at B=1 reduces to exact sequential greedy") {
    // one merge per round with a 4-candidate window: the dominance
    // filter is vacuous for the rank-1 pair, so the batch is exactly
    // the sequential argmax — the batched trainer is a strict
    // generalization of Sennrich greedy
    val (seq8, _) = Bpe.learn(spark, sf, 6)
    val (bat, _) = Bpe.learnBatched(spark, sf, rounds = 6, batch = 1)
    assert(bat.map { case (r, k, a, b, pc) => (r, a, b, pc) } ==
      seq8.map { case (r, a, b, pc) => (r.toLong, a, b, pc) })
    assert(bat.forall(_._2 == 1L))
  }

  test("batched rounds select symbol-disjoint merges, >1 per round") {
    val (merges, _) = Bpe.learnBatched(spark, sf, rounds = 4, batch = 4)
    assert(merges.nonEmpty)
    // independence within every round: no symbol appears in two
    // selected pairs (the property that makes one-pass application
    // equal sequential application of the batch)
    merges.groupBy(_._1).foreach { case (r, sel) =>
      val syms = sel.flatMap { case (_, _, a, b, _) => Seq(a, b) }
      assert(syms.distinct.size == syms.size,
        s"round $r selected symbol-sharing pairs: $sel")
      // and no pair's symbol equals another pair's CONCATENATION —
      // (a,b) then (ab,c) share no symbol yet are order-dependent;
      // the one-pass rewrite would miss the ab symbols the first
      // merge creates (the dominance filter's concat clause)
      val made = sel.map { case (_, _, a, b, _) => a + b }.toSet
      assert(syms.forall(!made.contains(_)),
        s"round $r selected a pair consuming another's output: $sel")
      // rnk is 1..n within the round
      assert(sel.map(_._2).sorted == (1L to sel.size).toSeq)
    }
    // batching must actually batch on this corpus: 4 rounds yield
    // more merges than 4 sequential rounds would
    assert(merges.size > 4, s"only ${merges.size} merges in 4 rounds")
    // job-count scaling: vocab additions per driver round trip is
    // merges/rounds > 1 — the O(rounds) vs O(vocab) contract
  }

  test("exact path refuses production vocab sizes; training is " +
    "memoized per (dir, rounds)") {
    // the SURVEY §2 contract made executable: beyond 128 merges the
    // one-job-per-merge exact loop must hand off to learnBatched
    val e = intercept[IllegalArgumentException](Bpe.learn(spark, sf, 129))
    assert(e.getMessage.contains("learnBatched"))
    // memoization: a second call returns the SAME final symbol frame
    // (reference equality — no retraining), so bpe_learn,
    // bpe_tokenize, and the bench share one training run
    val (m1, w1) = Bpe.learn(spark, sf, 8)
    val (m2, w2) = Bpe.learn(spark, sf, 8)
    assert(m1 == m2)
    assert(w1 eq w2, "second learn() retrained instead of memoizing")
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
