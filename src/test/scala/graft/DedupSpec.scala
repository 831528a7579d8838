package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")

  test("shingleRows equals the array-form shingle sets") {
    val fromArrays = Dedup.withShingles(docs)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fromRows = Dedup.shingleRows(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fromRows == fromArrays)
  }

  test("exact dedup finds exactly the planted duplicate groups") {
    val out = Dedup.exact(Dedup.corpusWithExactDups(spark, sf)).collect()
    val planted = docs.where(col("doc_id") % 10 === 0).count()
    assert(out.length == planted)
    assert(out.forall(_.getLong(1) == 2)) // each group: original + copy
  }

  test("minhash bands: 4 bands per doc, deterministic keys") {
    val b = Dedup.minhashSignatures(spark, sf)
    assert(b.count() == docs.count() * Dedup.NumBands)
    val b2 = Dedup.minhashSignatures(spark, sf)
    assert(b.collect().toSeq == b2.collect().toSeq)
  }

  test("minhash pairs verify against brute-force jaccard >= 0.5") {
    // brute force over ALL pairs via array intersection
    val sh = Dedup.withShingles(docs).select("doc_id", "shingles")
    val brute = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        (size(array_intersect(col("a.shingles"), col("b.shingles")))
          .cast("double") /
          (size(col("a.shingles")) + size(col("b.shingles")) -
            size(array_intersect(col("a.shingles"), col("b.shingles")))))
          .as("j"))
      .where(col("j") >= 0.5)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashPairs(spark, sf)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH may miss borderline pairs but must not invent any,
    // and must catch the high-jaccard planted dups
    assert(lsh.subsetOf(brute))
    val high = brute // planted dups are j>=0.9 at every SF
    assert(lsh.intersect(high).size >= (high.size * 0.9).toInt,
      s"recall too low: ${lsh.size}/${high.size}")
  }

  test("connected components label every node with its component min") {
    import spark.implicits._
    // two chains and a triangle: {1-2-3-4}, {10-11}, {20-21-22 cycle}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("near-dup clusters honor the pair graph on real data") {
    val pairs = Dedup.minhashPairs(spark, sf).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.nearDupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // transitivity: both ends of every verified pair share a cluster
    // (this is the assertion a broken propagation actually fails)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // every cluster is labeled by its own minimum member
    val byCluster = clusters.toSeq.groupBy(_._2)
    byCluster.foreach { case (cid, ms) =>
      assert(ms.map(_._1).min == cid, s"cluster $cid not labeled by its min")
    }
  }

  test("incremental pairs catch every planted batch near-dup, cross-only") {
    val pairs = Dedup.incrementalPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the indexed path (persisted signature table + collision-pruned
    // verify) is result-identical to the definitional twin
    val indexed = Dedup.incrementalQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(indexed.toSeq == pairs.toSeq, "indexed path drifted from twin")
    // every pair is (batch id, corpus id) — never corpus×corpus
    pairs.foreach { case (id1, id2, j) =>
      assert(id1 >= 200000L && id2 < 200000L, s"non-cross pair ($id1,$id2)")
      assert(j >= 0.5 && j <= 1.0)
    }
    // each planted batch doc (original + one appended token) must
    // rediscover its own original with near-1 jaccard
    val byBatch = pairs.groupBy(_._1)
    val planted = Tables.documents(spark, sf)
      .where(org.apache.spark.sql.functions.col("doc_id") % 9 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    planted.foreach { orig =>
      val matches = byBatch.getOrElse(orig + 200000L, Array.empty)
      assert(matches.exists(_._2 == orig),
        s"batch ${orig + 200000L} missed its original $orig")
    }
  }

  test("duplicated spans: exact coordinates on a known shared passage") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f g h i j STOP x y z"),
      (2L, "PRE1 PRE2 a b c d e f g h i j END1 END2"),
      (3L, "totally unrelated words only here once more again")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(corpus, minTokens = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the 10-token passage sits at tokens 0..9 of doc 1, 2..11 of doc 2;
    // boundary grams ("i j STOP" vs "i j END1") differ, so the island
    // stops exactly at the passage edge on both sides
    assert(spans.toSet == Set((1L, 0L, 9L, 10L), (2L, 2L, 11L, 10L)))
    // raising the bar past the passage length erases it
    assert(Dedup.duplicatedSpans(corpus, minTokens = 11).count() == 0L)
  }

  test("duplicated spans: each planted full-doc duplicate is one full span") {
    val spans = Dedup.duplicatedSpansQuery(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    val planted = docs.where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    planted.foreach { case (id, n) =>
      // the whole doc is duplicated verbatim, so every gram position is
      // shared and the island merge yields the single doc-length span —
      // on the copy AND on its source
      assert(spans(id + 100000L).contains((0L, (n - 1).toLong)),
        s"copy ${id + 100000L} lacks the full span")
      assert(spans(id).contains((0L, (n - 1).toLong)),
        s"source $id lacks the full span")
    }
  }

  test("containment catches a true subset that sits below the jaccard bar") {
    import spark.implicits._
    // A's 10 tokens appear verbatim inside B's 40: containment = 1.0
    // while jaccard ≈ 8/38 ≈ 0.21 — the near-superset class minhash
    // pair mining (bar 0.5) never surfaces
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val wrap = (1 to 15).map(i => s"pre$i").mkString(" ") + " " + passage +
      " " + (1 to 15).map(i => s"post$i").mkString(" ")
    val noise = (1 to 3).map(i =>
      ((100 + i).toLong, (1 to 30).map(j => s"n${i}x$j").mkString(" ")))
    val corpus = (Seq((1L, passage), (2L, wrap)) ++ noise)
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairsOn(corpus, 0.8, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(got.length == 1, s"expected exactly the planted pair, got ${got.toSeq}")
    val (id1, id2, cont, j) = got.head
    assert((id1, id2) == (1L, 2L))
    assert(cont == 1.0, s"containment $cont != 1.0")
    // below the near-dup verify bar (0.5): the jaccard pipeline would
    // have filtered this pair even if a band had collided
    assert(j < 0.5, s"jaccard $j not below the near-dup bar — test corpus bad")
  }

  test("signature index maintenance: upsert/delete ≡ rebuild, " +
      "redelivery no-op, emptied buckets vanish") {
    import java.nio.file._
    def rows(p: String) = spark.read.parquet(p)
      .select("doc_id", "c", "band", "band_key")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val base = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val grown = Files.createTempDirectory(Paths.get("target"), "sigup")
      .toAbsolutePath.toString
    Dedup.buildSignatureIndex(base, grown)
    Dedup.signatureIndexUpsert(spark, grown, batch)
    val full = Files.createTempDirectory(Paths.get("target"), "sigfull")
      .toAbsolutePath.toString
    Dedup.buildSignatureIndex(docs, full)
    assert(rows(grown) == rows(full), "upsert-grown != rebuilt")
    // redelivery: the same batch replaces its own rows — a no-op
    Dedup.signatureIndexUpsert(spark, grown, batch)
    assert(rows(grown) == rows(full), "redelivery changed the index")
    // delete the batch back out ≡ rebuild on the remaining corpus
    Dedup.signatureIndexDelete(spark, grown, batch.select("doc_id"))
    val rebuiltBase = Files.createTempDirectory(Paths.get("target"), "sigbase")
      .toAbsolutePath.toString
    Dedup.buildSignatureIndex(base, rebuiltBase)
    assert(rows(grown) == rows(rebuiltBase), "post-delete != rebuild")
    // deleting every remaining doc must delete the bucket DIRECTORIES
    // (dynamic overwrite alone would leave stale emptied partitions)
    Dedup.signatureIndexDelete(spark, grown, base.select("doc_id"))
    val dirs = new java.io.File(grown).listFiles()
      .filter(_.getName.startsWith("bk="))
    assert(dirs.isEmpty,
      s"emptied buckets survived: ${dirs.map(_.getName).toSeq}")
  }

  test("semdedup: keep-first within k-means cells; a cell's min id " +
      "never drops and every reported cell matches the assignment") {
    import graft.operators.Ann
    val out = Dedup.semDedup(spark, sf).collect()
    assert(out.nonEmpty)
    // (doc_id, cell, keeper, cosine): keeper strictly below, bar met
    assert(out.forall(r => r.getLong(2) < r.getLong(0)))
    assert(out.forall(r => r.getDouble(3) >= 0.35))
    // same public training chain the operator caches → same cells
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val a = Ann.ivfAssign(e, Ann.kmeansCentroids(e, 200))
      .select("id", "cell")
    val cellOf = a.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall(r => cellOf(r.getLong(0)) == r.getLong(1)))
    // keep-first: the minimum id of a cell has no lower-id partner,
    // so it can never appear as a dropped doc
    val minIds = a.groupBy("cell").agg(min("id").as("m"))
      .collect().map(_.getLong(1)).toSet
    assert(minIds.intersect(out.map(_.getLong(0)).toSet).isEmpty)
  }

  test("incremental semdedup: every planted exact copy drops, onto a " +
      "cos≈1 partner, under the frozen centroids") {
    val out = Dedup.semDedupIncremental(spark, sf).collect()
    val planted = Tables.embeddings(spark, sf)
      .where(col("vec_id") % 11 === 0).count()
    // an exact copy shares its original's cell (same vector → same
    // argmin) and scores ~1.0 against it — so every arrival drops
    assert(out.length == planted)
    assert(out.forall(_.getDouble(3) >= 0.9999))
    // keeper precedes the dropped arrival (corpus id or earlier batch)
    assert(out.forall(r => r.getLong(2) < r.getLong(0)))
  }

  test("canonical: one keeper per cluster, keeper is the best member") {
    val out = Dedup.canonicalMap(spark, sf).collect()
    assert(out.length > 0)
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      val members = rows.map(_.getLong(0)).toSet
      val canon = rows.map(_.getLong(2)).toSet
      assert(canon.size === 1, s"cluster $cid has ${canon.size} canonicals")
      assert(members.contains(canon.head),
        s"cluster $cid canonical ${canon.head} is not a member")
      val kept = rows.filter(_.getBoolean(3)).map(_.getLong(0))
      assert(kept.toSeq === Seq(canon.head))
    }
    // keeper maximizes (quality, -doc_id) among its cluster
    val q = operators.TextOps.qualityMetrics(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.col("quality_score"),
          org.apache.spark.sql.functions.lit(-1.0)).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    byCluster.foreach { case (cid, rows) =>
      val best = rows.map(_.getLong(0)).minBy(d => (-q(d), d))
      assert(rows.head.getLong(2) === best,
        s"cluster $cid keeper ${rows.head.getLong(2)} != best $best")
    }
  }

  test("winnowing: a shared substring of length >= k+w-1 guarantees " +
    "a shared fingerprint; selection stays sparse") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog"
    val d1 = s"completely unrelated lead-in text $shared plus a tail"
    val d2 = s"zq different opening words here $shared ending otherwise"
    val d3 = "nothing in common with either document whatsoever"
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val fps = operators.Dedup.winnowFingerprints(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the paper's guarantee: any shared substring of length >= k+w-1
    // (= 8 chars here, and `shared` is far longer) yields at least
    // one common selected fingerprint
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "winnowing missed the planted shared substring")
    // selection is SPARSE: far fewer fingerprints than positions
    // (expected density 2/(w+1) ~ 0.4 of windows, dedup on top)
    val m1 = d1.length - 4
    assert(byDoc(1L).size < m1 / 2 + 2,
      s"fingerprint selection not sparse: ${byDoc(1L).size} of $m1")
    assert(byDoc(3L).nonEmpty, "every long-enough doc fingerprints")
  }

  test("winnowing index: batch lookup finds re-entered origins; " +
    "upsert is redelivery-idempotent; delete erases a doc's pairs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "winidx")
    val path = dir.resolve("fps").toString
    try {
      // DISTINCTIVE synthetic corpus (the driver fixture's templated
      // text makes most fingerprints corpus-ubiquitous — df > maxDf —
      // which is exactly what the stop-fingerprint guard is FOR; the
      // machinery pin needs docs whose content is their own):
      // per-doc DISJOINT letter alphabet → every cross-doc 5-gram
      // contains the doc's letter, so shared fps exist only between a
      // doc and its own re-entry (26 docs, tag = 4× the doc letter)
      val corpus = (0L until 26L).map { i =>
        val tag = ('a' + i).toChar.toString * 4
        (i, (0 until 12).map(j => s"$tag$j").mkString(" "))
      }.toDF("doc_id", "text")
      operators.Dedup.buildWinnowIndex(corpus, path)
      val batch = corpus.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" zzyzx")).as("text"))
      val pairs = operators.Dedup.winnowIncremental(spark, path, batch)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.nonEmpty)
      // ids never mix sides: id1 is always a batch doc, id2 corpus
      assert(pairs.forall { case (a, b) => a >= 200000L && b < 200000L })
      // each batch doc is its origin + one token — the long shared
      // substring guarantees shared selected fingerprints for all
      val batchIds = batch.select("doc_id").collect().map(_.getLong(0))
      val hit = batchIds.count(b => pairs.contains((b, b - 200000L)))
      assert(hit == batchIds.length,
        s"only $hit/${batchIds.length} origins rediscovered")
      // and nothing ELSE matches: distinct stems → no cross pairs
      assert(pairs.forall { case (a, b) => a - 200000L == b },
        "distinct-content docs spuriously paired")
      // redelivery-idempotent upsert: same batch twice = same index
      operators.Dedup.winnowIndexUpsert(spark, path, batch)
      val once = spark.read.parquet(path).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      operators.Dedup.winnowIndexUpsert(spark, path, batch)
      val twice = spark.read.parquet(path).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(once == twice, "redelivered upsert changed the index")
      // delete erases exactly that doc's rows and downstream pairs
      val victim = pairs.head._2
      operators.Dedup.winnowIndexDelete(spark, path,
        corpus.where(col("doc_id") === victim).select("doc_id"))
      val after = spark.read.parquet(path)
        .where(col("doc_id") === victim).count()
      assert(after == 0L, "deleted doc still in the index")
      val pairs2 = operators.Dedup.winnowIncremental(spark, path, batch)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(!pairs2.exists(_._2 == victim),
        "deleted doc still matches incrementally")
    } finally {
      new scala.reflect.io.Directory(dir.toFile).deleteRecursively()
    }
  }

  test("normalization stage: NFC/NFD byte-variants dedup as ONE doc " +
    "through exact AND minhash; width-fold + casefold collapse too") {
    import spark.implicits._
    val composed = "café au lait bien chaud"   // é = U+00E9
    val decomposed = "café au lait bien chaud" // e + U+0301
    val other = "a completely unrelated document about spark plans"
    val raw = Seq((1L, composed), (2L, decomposed), (3L, other))
      .toDF("doc_id", "text")
    // raw bytes differ → byte-keyed exact dedup is blind to the pair
    assert(operators.Dedup.exact(raw).count() == 0)
    // the opt-in normalization stage collapses them, untouched plans
    val nd = operators.TextOps.normalizeDocs(raw)
    val groups = operators.Dedup.exact(nd).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("n_copies") == 2L)
    assert(groups(0).getAs[Long]("canonical_id") == 1L)
    // minhash signatures become identical as well — near-dup LSH
    // treats the variants as the same doc in every band
    val bands = operators.Dedup.minhashBands(nd)
      .where(col("doc_id") <= 2L)
      .select("doc_id", "band", "band_key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = bands.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(byDoc(1L) == byDoc(2L), "band keys diverged after normalize")
    // width folding and casefold: full-width ASCII + ideographic
    // space + uppercase all land on the plain form
    val wide = "ＣＡＦＥ　ＭＥＮＵ！"
    val got = Seq(Tuple1(wide)).toDF("t")
      .select(operators.TextOps.normalize(col("t"))).head.getString(0)
    assert(got == "cafe menu!", s"width-fold/casefold broke: '$got'")
  }

  test("edit-distance re-score: exact-dup pairs score 1.0, similarity " +
    "bounded, DP confined to the verified pair set") {
    val out = operators.Dedup.editDistancePairs(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (id1, id2) = (r.getLong(0), r.getLong(1))
      val (lev, sim) = (r.getLong(3), r.getDouble(4))
      assert(sim >= 0.0 && sim <= 1.0, s"sim out of range for ($id1,$id2)")
      val ml = math.max(docs(id1).length, docs(id2).length)
      assert(lev <= ml, s"lev above maxlen for ($id1,$id2)")
      if (docs(id1) == docs(id2))
        assert(lev == 0L && sim == 1.0,
          s"identical texts must score lev=0/sim=1 for ($id1,$id2)")
    }
    // the pair set is EXACTLY the verified minhash pairs with a
    // nonempty longer side — the DP never widens the candidate set
    val verified = operators.Dedup.minhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet
      .subsetOf(verified))
  }
}
