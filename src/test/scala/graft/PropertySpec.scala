package graft

import graft.operators.{ScoredId, TopKAgg, TopKBuf}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of the aggregation kernels, checked WITHOUT
  * Spark: reduce/merge/finish are pure, so distribution invariance
  * (any partitioning, any merge order) is testable directly — the
  * property that makes map-side partial aggregation correct.
  * Seeded pseudo-random cases keep runs reproducible.
  */
class PropertySpec extends AnyFunSuite {

  private def cases(seed: Long, n: Int): Seq[List[ScoredId]] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      List.fill(rnd.nextInt(300))(
        ScoredId(rnd.nextInt(2000) - 1000.0, rnd.nextInt(1000).toLong))
    }
  }

  test("TopKAgg: any chunking + merge order equals global sort-take") {
    val agg = new TopKAgg(5)
    for (xs <- cases(seed = 42, n = 60)) {
      val rnd = new scala.util.Random(xs.length)
      val nChunks = rnd.nextInt(6) + 1
      val chunks = xs.grouped(math.max(1, xs.length / nChunks)).toList
      val partials = rnd.shuffle(
        chunks.map(c => c.foldLeft(agg.zero)(agg.reduce)))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged).items.toList
      val expect = xs.sortBy(s => (s.key, s.id)).take(5)
      assert(got == expect)
    }
  }

  test("TopKAgg: merge is associative on the observable result") {
    val agg = new TopKAgg(3)
    val cs = cases(seed = 7, n = 90)
    for (Seq(a, b, c) <- cs.grouped(3)) {
      def buf(l: List[ScoredId]): TopKBuf = l.foldLeft(agg.zero)(agg.reduce)
      val left = agg.merge(agg.merge(buf(a), buf(b)), buf(c))
      val right = agg.merge(buf(a), agg.merge(buf(b), buf(c)))
      assert(agg.finish(left) == agg.finish(right))
    }
  }

  test("TopKAgg: compaction bound holds (buffer never exceeds cap)") {
    val agg = new TopKAgg(4)
    for (xs <- cases(seed = 99, n = 30)) {
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      assert(buf.items.length <= math.max(4 * 4, 64))
    }
  }
}
