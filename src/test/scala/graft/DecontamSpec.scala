package graft

import graft.operators.{Decontam, Dedup, Sampling}
import org.apache.spark.sql.functions._

class DecontamSpec extends SparkSuite {

  test("planted cross-split duplicates are all caught at overlap 1.0") {
    val corpus = Dedup.corpusWithExactDups(spark, sf)
    val split = Sampling.split(corpus, "doc_id", 0.8, 0.0)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val got = Decontam.contamination(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty, "no contamination found on the planted corpus")

    // every reported pair respects the split orientation and threshold
    got.foreach { case (evalId, trainId, _, overlap) =>
      assert(split(trainId) == "train", s"$trainId not a train doc")
      assert(split(evalId) != "train", s"$evalId not an eval doc")
      assert(overlap >= 0.2 && overlap <= 1.0, s"overlap $overlap")
    }

    // each planted duplicate whose two copies straddle the split is
    // exact contamination and MUST be reported with full overlap
    val reported = got.map(t => (t._1, t._2)).toSet
    val straddling = split.keys.filter(_ >= 100000L).flatMap { dup =>
      val orig = dup - 100000L
      (split(orig), split(dup)) match {
        case ("train", e) if e != "train" => Some((dup, orig))
        case (e, "train") if e != "train" => Some((orig, dup))
        case _                            => None
      }
    }.toSet
    assert(straddling.nonEmpty, "fixture lost its cross-split duplicates")
    straddling.foreach { case (e, t) =>
      assert(reported((e, t)), s"missed exact contamination eval=$e train=$t")
      val row = got.find(r => r._1 == e && r._2 == t).get
      assert(row._4 == 1.0, s"exact duplicate scored ${row._4}, not 1.0")
    }
  }
}
