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
}
