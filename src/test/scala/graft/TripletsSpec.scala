package graft

import graft.operators.{Dedup, Triplets}
import graft.functions.Md5Prefix60
import org.apache.spark.sql.functions._

class TripletsSpec extends SparkSuite {

  test("triplets: coverage, separation, co-batching, determinism") {
    val trips = Triplets.triplets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(trips.nonEmpty)

    val pairSet = Dedup.minhashPairsUnsorted(spark, sf, 0.5)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every verified pair anchors a triplet in BOTH orientations
    val anchored = trips.map(t => (t._1, t._2)).toSet
    pairSet.foreach { case (a, b) =>
      assert(anchored((a, b)) && anchored((b, a)), s"pair ($a,$b) uncovered")
    }
    trips.foreach { case (a, p, n) =>
      // the negative is a third document…
      assert(n != a && n != p, s"degenerate triplet ($a,$p,$n)")
      // …and not a verified near-dup of the anchor
      assert(!pairSet((math.min(a, n), math.max(a, n))),
        s"negative $n is a near-dup of anchor $a")
    }

    // negatives come from the anchor's own md5 batch
    val batchOf = Tables.documents(spark, sf)
      .select(col("doc_id"),
        pmod(Md5Prefix60(col("doc_id").cast("string")), lit(8L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    trips.foreach { case (a, _, n) =>
      assert(batchOf(a) == batchOf(n), s"negative $n left anchor $a's batch")
    }

    // pure function of ids: a second evaluation reproduces it
    val again = Triplets.triplets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(trips.toSeq == again.toSeq)
  }

  test("hard triplets: negatives are near-miss bucket mates, never dups") {
    val hard = Triplets.tripletsHard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hard.nonEmpty, "near-miss pool produced no hard triplets")

    val missSet = Dedup.simhashNearMisses(spark, sf).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).toSet
    val pairSet = Dedup.minhashPairsUnsorted(spark, sf, 0.5)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    hard.foreach { case (a, p, n) =>
      assert(n != a && n != p, s"degenerate hard triplet ($a,$p,$n)")
      assert(missSet((a, n)),
        s"negative $n is not a near-miss bucket mate of anchor $a")
      assert(!pairSet((math.min(a, n), math.max(a, n))),
        s"hard negative $n is a verified near-dup of anchor $a")
    }

    val again = Triplets.tripletsHard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hard.toSeq == again.toSeq)
  }
}
