package graft

import graft.operators.{ScoredId, TopKAgg, TopKHeap}
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
      def buf(l: List[ScoredId]): TopKHeap = l.foldLeft(agg.zero)(agg.reduce)
      val left = agg.merge(agg.merge(buf(a), buf(b)), buf(c))
      val right = agg.merge(buf(a), agg.merge(buf(b), buf(c)))
      assert(agg.finish(left) == agg.finish(right))
    }
  }

  test("TopKAgg: buffer is bounded at k, never more") {
    val agg = new TopKAgg(4)
    for (xs <- cases(seed = 99, n = 30)) {
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      assert(buf.size <= 4)
      // and it retains exactly the best min(k, n) of what it saw
      assert(buf.sorted == xs.sortBy(s => (s.key, s.id)).take(4))
    }
  }

  test("QuantUtils.encode: range, monotonicity, endpoint exactness") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 200) {
      val min = rnd.nextDouble() * 10 - 5
      val max = min + rnd.nextDouble() * 10
      val xs = Seq.fill(50)(min + rnd.nextDouble() * (max - min)).sorted
      val codes = xs.map(x =>
        graft.functions.QuantUtils.encode(x, min, max) & 0xff)
      assert(codes.forall(c => c >= 0 && c <= 255))
      // affine map preserves order
      assert(codes == codes.sorted)
      if (max > min) {
        assert((graft.functions.QuantUtils.encode(min, min, max) & 0xff) == 0)
        assert((graft.functions.QuantUtils.encode(max, min, max) & 0xff) == 255)
      }
      // out-of-range inputs clamp, never wrap
      assert((graft.functions.QuantUtils.encode(min - 100, min, max) & 0xff) == 0)
      assert((graft.functions.QuantUtils.encode(max + 100, min, max) & 0xff)
        == (if (max > min) 255 else 0))
    }
  }

  test("WAL framing: frame/decode round-trips arbitrary record content") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 100) {
      // records may contain '|', newlines, unicode — framing is
      // length-based, so none of it needs escaping
      val recs = Seq.fill(rnd.nextInt(8))(
        Seq.fill(rnd.nextInt(40))(
          "ab|\n{}\"é€"(rnd.nextInt(9))).mkString)
      assert(graft.sources.WalBinary.decodeFrames(
        graft.sources.WalBinary.frame(recs)) == recs)
    }
  }

  test("ByteUtils: sample indices and sum against naive forms") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 100) {
      val bytes = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      val stride = rnd.nextInt(19) + 1
      val naiveSample = bytes.indices.filter(_ % stride == 0).map(bytes)
      assert(graft.functions.ByteUtils.byteSample(bytes, stride).toSeq
        == naiveSample)
      assert(graft.functions.ByteUtils.byteSum(bytes)
        == bytes.map(_ & 0xffL).sum)
    }
  }
}
