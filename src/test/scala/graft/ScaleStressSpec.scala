package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup}

class ScaleStressSpec extends SparkSuite {

  private lazy val x4 = ScaleStress.materialize(spark, sf, 4)

  test("factor 1 is a fresh cold dir with byte-identical content") {
    // a COPY, not the base dir: memo caches and persisted indexes
    // key on the dir string, so x1 must be cold like x4/x16
    val x1 = ScaleStress.materialize(spark, sf, 1)
    assert(x1 != sf)
    assert(Tables.documents(spark, x1).orderBy("doc_id").collect().toSeq ==
      Tables.documents(spark, sf).orderBy("doc_id").collect().toSeq)
    assert(Tables.embeddings(spark, x1).count() ==
      Tables.embeddings(spark, sf).count())
    val again = ScaleStress.materialize(spark, sf, 4)
    assert(again == x4, "idempotent path")
  }

  test("replica tables are exact ×-multiples with the base schema") {
    val baseDocs = Tables.documents(spark, sf)
    val docs = Tables.documents(spark, x4)
    assert(docs.schema == baseDocs.schema)
    assert(docs.count() == 4 * baseDocs.count())
    assert(docs.select("doc_id").distinct().count() == docs.count(),
      "re-keying keeps doc_ids unique")
    val baseEmb = Tables.embeddings(spark, sf)
    val emb = Tables.embeddings(spark, x4)
    assert(emb.schema == baseEmb.schema)
    assert(emb.count() == 4 * baseEmb.count())
    assert(emb.select("vec_id").distinct().count() == emb.count())
    // replica 0 is byte-identical to the base corpus (the x1 slice
    // of every replica dir IS the driver's data)
    val rep0 = docs.where(col("doc_id") < 10000000L)
      .orderBy("doc_id").collect().toSeq
    assert(rep0 == baseDocs.orderBy("doc_id").collect().toSeq)
    // n_chars stays consistent with the perturbed text
    assert(docs.where(length(col("text")) =!= col("n_chars")).count() == 0)
  }

  /** The load-bearing synthesis property: replicas of one document
    * must NOT be near-dup candidates of each other, or the pair
    * stage measures the quadratic synthesis artifact instead of the
    * algorithm. Markers inserted between every word put the replica
    * id inside every word-3-gram, so cross-replica shingle sets are
    * disjoint and every minhash pair stays within one replica.
    */
  test("minhash pairs never cross replicas; per-replica structure matches base") {
    val pairs = Dedup.minhashPairsUnsorted(spark, x4)
    val cross = pairs.where(
      floor(col("id1") / 10000000L) =!= floor(col("id2") / 10000000L))
    assert(cross.count() == 0, "no cross-replica candidate pairs")
    // replica 0 reproduces the base corpus's pair set exactly
    val basePairs = Dedup.minhashPairsUnsorted(spark, sf)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rep0Pairs = pairs
      .where(col("id1") < 10000000L && col("id2") < 10000000L)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rep0Pairs == basePairs)
  }

  /** The v6 embedding analog of the minhash property above: the
    * per-replica ROTATION must not plant cross-replica near-dup
    * cliques (the v5 +0.001·rep shift did — every replica of a base
    * vector sat at cos ≈ 0.9999, so ALL ~2000·C(F,2) same-base
    * pairs survived SemDeDup's τ and the x64 legs measured a
    * quadratic synthesis artifact). Exact cross-replica
    * disjointness is impossible for embeddings (an isotropic corpus
    * genuinely contains τ-neighbors across any partition of it), so
    * the pin is the CLIQUE discriminator: same-base cross-replica
    * pairs must survive at a rare-tail rate, never wholesale.
    */
  test("rotation replicas: no same-base near-dup cliques; isometry holds") {
    // rep 0 is byte-identical to the base corpus
    val baseEmb = Tables.embeddings(spark, sf)
    val emb = Tables.embeddings(spark, x4)
    assert(emb.where(col("vec_id") < 10000000L)
      .orderBy("vec_id").collect().toSeq ==
      baseEmb.orderBy("vec_id").collect().toSeq)
    // isometry: every replica's norm multiset equals the base's
    // (rotation permutes coordinates, so per-vector norms are exact)
    val norms = emb.select(
      floor(col("vec_id") / 10000000L).as("rep"),
      round(aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x * x), 6).as("n2"))
      .groupBy("rep", "n2").count()
      .groupBy("n2").agg(countDistinct(col("count")).as("spread"),
        count(lit(1)).as("reps"))
      .where(col("reps") =!= 4 || col("spread") =!= 1)
    assert(norms.count() == 0, "per-replica norm multisets differ")
    // clique discriminator: of the 2000·C(4,2) same-base
    // cross-replica pairs, only a rare tail may survive SemDeDup
    // (the shift scheme had ~all of them surviving)
    val pairs = graft.operators.Dedup.semDedup(spark, x4)
      .select(pmod(col("doc_id"), lit(10000000L)).as("b1"),
        pmod(col("keeper"), lit(10000000L)).as("b2"),
        floor(col("doc_id") / 10000000L).as("r1"),
        floor(col("keeper") / 10000000L).as("r2"))
    val sameBaseCross = pairs
      .where(col("b1") === col("b2") && col("r1") =!= col("r2")).count()
    val population = baseEmb.count() * 6 // C(4,2) per base vector
    assert(sameBaseCross < population / 10,
      s"$sameBaseCross same-base cross-replica survivors of $population " +
        "possible — the replica scheme is planting near-dup cliques")
  }

  test("knn graph scales node-linearly on the replica corpus") {
    val n = Tables.embeddings(spark, x4).count()
    val g = Ann.knnGraph(spark, x4)
    // every vector gets exactly k=5 neighbors at this density
    assert(g.count() == n * 5)
    assert(g.select("qid").distinct().count() == n)
  }

  test("hnsw hierarchy thins geometrically on the replica corpus; " +
    "search stays k-per-query with a single global entry") {
    val n = Tables.embeddings(spark, x4).count()
    val lv = Tables.embeddings(spark, x4)
      .select(Ann.hnswLevel(col("vec_id")).as("l"))
      .groupBy("l").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val upper = lv.collect { case (l, c) if l >= 1 => c }.sum
    // the md5-geometric rate holds on re-keyed replica ids too:
    // upper layers stay a small minority (expected n/8 + n/64 + …)
    assert(upper > 0 && upper < n / 4,
      s"upper-layer population $upper of $n not geometric")
    val out = Ann.hnswSearch(spark, x4,
      Tables.embeddings(spark, x4).where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.groupBy(_._1).forall(_._2.length == 10))
  }

  test("events replica: per-user timelines are a bijection of the base") {
    val baseEv = Tables.events(spark, sf)
    val ev = Tables.events(spark, x4)
    assert(ev.count() == 4 * baseEv.count())
    assert(ev.select("user_id").distinct().count() ==
      4 * baseEv.select("user_id").distinct().count())
    // the pattern-match result on replica 0 IS the base result, and
    // each replica contributes the identical per-user match multiset
    val base = graft.operators.Sequence.patternMatch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rep0 = graft.operators.Sequence.patternMatch(spark, x4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 < 10000000L).toSet
    assert(rep0 == base)
    val total = graft.operators.Sequence.patternMatch(spark, x4)
      .agg(sum("n_matches")).collect()(0).getLong(0)
    val baseTotal = graft.operators.Sequence.patternMatch(spark, sf)
      .agg(sum("n_matches")).collect()(0).getLong(0)
    assert(total == 4 * baseTotal)
  }

  test("every probe query runs against a replica dir") {
    // the probe matrix only materializes documents/embeddings/events —
    // a queryNames entry that reads any other table would fail COLD
    // inside the bench (recording -1.0 for the whole probe family);
    // catch it here on the cheap factor-1 copy instead
    val x1 = ScaleStress.materialize(spark, sf, 1)
    ScaleStress.queryNames.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        fail(s"probe query $n not in the registry"))
      val rows = fn(spark, x1).limit(1).collect()
      assert(rows.nonEmpty, s"probe query $n returned nothing on x1")
    }
  }

  test("renderJson is compact and factor-ordered") {
    val j = ScaleStress.renderJson(Map(
      "knn_graph" -> Map("x16" -> 2.5, "x1" -> 0.5, "x4" -> 1.0)))
    assert(j == """{"knn_graph":{"x1":0.500,"x4":1.000,"x16":2.500}}""")
  }
}
