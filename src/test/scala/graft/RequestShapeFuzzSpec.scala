package graft

import graft.operators.{Ann, Knn, Upsert}
import org.apache.spark.sql.functions._

/** REQUEST-SHAPE FUZZ (r14, VERDICT r13 #6): the seeded oracle fuzz
  * perturbs DATA values; the r13 request-shaped APIs (batch update,
  * named vectors, discover/context, multitenancy, geo) additionally
  * have STRUCTURED edge cases — op orderings, name misses, degenerate
  * example pairs, empty scopes, zero radii, k past the corpus — that
  * value perturbation never reaches. Three fixed seeds drive
  * randomized request construction; every assertion is an INVARIANT
  * of the operator contract, so a red run is an engine-semantics bug,
  * not a flaky fixture.
  */
class RequestShapeFuzzSpec extends SparkSuite {

  private val seeds = Seq(11, 23, 47)

  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("batch_update: a version-fixed op set is input-order invariant") {
    import spark.implicits._
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .where(col("doc_id") < 40)
    seeds.foreach { seed =>
      val rng = new scala.util.Random(seed)
      // ~30 ops over 12 keys; versions unique PER KEY (the WAL
      // contract batchUpdate documents); payload fields sometimes
      // null (patch-keep semantics)
      val keys = rng.shuffle((0L until 40L).toList).take(12)
      val ops = keys.flatMap { k =>
        val n = 1 + rng.nextInt(4)
        rng.shuffle((1L to 6L).toList).take(n).map { v =>
          val op = Seq("upsert", "patch", "delete")(rng.nextInt(3))
          val lang = if (rng.nextBoolean()) s"l$seed${rng.nextInt(3)}" else null
          val src = if (rng.nextBoolean()) s"s${rng.nextInt(3)}" else null
          val nc = if (rng.nextBoolean()) Some(rng.nextInt(1000).toLong)
                   else None
          (k, v, op, lang, src, nc)
        }
      }
      def frame(o: Seq[(Long, Long, String, String, String, Option[Long])]) =
        o.toDF("doc_id", "version", "op", "lang", "source", "n_chars")
      val a = Upsert.batchUpdate(base, frame(ops), "doc_id")
        .orderBy("doc_id").collect().map(_.toString)
      val b = Upsert.batchUpdate(base, frame(rng.shuffle(ops)), "doc_id")
        .orderBy("doc_id").collect().map(_.toString)
      assert(a.sameElements(b),
        s"seed $seed: op-order permutation changed the folded state")
    }
  }

  test("named vectors: an unknown `using` name returns zero rows and " +
    "leaves sibling requests untouched") {
    val e = emb.select(col("id"), col("vec").as("vec_title"),
      reverse(col("vec")).as("vec_body"))
    seeds.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val badName = s"img${rng.nextInt(100)}"
      val q = Tables.embeddings(spark, sf).where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          when(col("vec_id") === 0, lit(badName))
            .when(col("vec_id") === 1, lit("title"))
            .otherwise(lit("body")).as("using"))
      val out = Knn.topKNamedVectors(e, q, 5).collect()
      assert(!out.exists(_.getLong(0) == 0L),
        s"seed $seed: unknown vector name '$badName' produced rows")
      assert(out.count(_.getLong(0) == 1L) == 5 &&
        out.count(_.getLong(0) == 2L) == 5,
        s"seed $seed: sibling requests lost rows to the unknown name")
    }
  }

  test("discover/context: degenerate pairs (p == n) are win- and " +
    "loss-neutral; empty example set excludes nothing") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val corpusN = e.count()
    seeds.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val tid = rng.nextInt(20).toLong
      val pn = rng.nextInt(20).toLong // the SAME vector as p and n
      val vOf = e.where(col("id").isin(tid, pn))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val req = Seq((0L, vOf(tid), vOf(pn), vOf(pn), vOf(pn), vOf(pn),
        Seq.empty[Long]))
        .toDF("qid", "tvec", "p1vec", "n1vec", "p2vec", "n2vec", "ex")
      // discover: both pairs degenerate → zero wins everywhere → the
      // ranking collapses to plain cosine-to-target
      val disc = Knn.discover(e, req, 10).collect()
      assert(disc.forall(_.getLong(3) == 0L),
        s"seed $seed: degenerate pair scored a win")
      val plain = Knn.topK(e, req.select(col("qid"),
        col("tvec").as("qvec")), 10, Knn.Metric.Cosine)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(disc.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sameElements(plain),
        s"seed $seed: win-free discovery diverged from plain cosine kNN")
      // context: both pair losses 0 for every candidate → every
      // non-degenerate corpus row ties at loss 0, so k > corpus
      // returns them ALL (also the k-past-corpus invariant)
      val ctx = Knn.contextSearch(e, req, (corpusN * 2).toInt).collect()
      assert(ctx.length == corpusN,
        s"seed $seed: degenerate context didn't return the full corpus " +
          s"(${ctx.length} of $corpusN)")
      assert(ctx.forall(r => math.abs(r.getDouble(3)) < 1e-12),
        s"seed $seed: degenerate pair produced nonzero loss")
    }
  }

  test("tenant search: an empty tenant matches nothing; an absent " +
    "tenant in the batch starves no sibling") {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "rsfuzz")
    try {
      val idx = root.resolve("tidx").toString
      Ann.tenantBuildIndex(spark,
        emb.withColumn("tenant", col("id") % 4), idx)
      seeds.foreach { seed =>
        val rng = new scala.util.Random(seed)
        val ghost = 100L + rng.nextInt(50) // tenant with no rows
        val q = Tables.embeddings(spark, sf).where(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
            when(col("vec_id") === 0, lit(ghost))
              .otherwise(col("vec_id") % 4).as("tenant"))
        val out = Ann.tenantSearch(spark, idx, q, 5).collect()
        assert(!out.exists(_.getLong(0) == 0L),
          s"seed $seed: ghost tenant $ghost returned rows")
        assert(out.count(_.getLong(0) == 1L) == 5 &&
          out.count(_.getLong(0) == 2L) == 5,
          s"seed $seed: sibling tenants starved by the ghost request")
      }
      // fully empty batch: no tenants collected, no rows, no throw
      val none = Ann.tenantSearch(spark, idx,
        emb.where(col("id") < 0).select(col("id").as("qid"),
          col("vec").as("qvec"), col("id").as("tenant")), 5)
      assert(none.collect().isEmpty)
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("geo radius: zero radius admits exactly the center's " +
    "coordinates; k past the corpus pads nothing") {
    def latOf(id: org.apache.spark.sql.Column) =
      (id * 7919L % 18000L) / 100.0 - 90.0
    def lonOf(id: org.apache.spark.sql.Column) =
      (id * 104729L % 36000L) / 100.0 - 180.0
    val e = emb.select(col("id"), col("vec"),
      latOf(col("id")).as("lat"), lonOf(col("id")).as("lon"))
    seeds.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val cid = rng.nextInt(30).toLong
      val q = Tables.embeddings(spark, sf).where(col("vec_id") === cid)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          latOf(col("vec_id")).as("qlat"), lonOf(col("vec_id")).as("qlon"),
          lit(0.0).as("radius"))
      val out = Knn.topKGeoRadius(e, q, 1000000).collect()
      // every hit sits at the center's exact coordinates (the center
      // itself always qualifies; coordinate collisions legitimately
      // join it)
      assert(out.nonEmpty, s"seed $seed: center point missing itself")
      val coordsOf = e.select("id", "lat", "lon").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val center = coordsOf(cid)
      assert(out.forall(r => coordsOf(r.getLong(2)) == center),
        s"seed $seed: zero radius admitted an off-center point")
    }
  }

  // ---- r15 (VERDICT r14 #7): request-shape fuzz over the r14
  // surfaces — prefetch->rescore boundaries, the fusion pair's
  // degenerate legs, weight endpoints ------------------------------

  test("prefetch->rescore: stage-2 ids are a subset of the stage-1 " +
    "shortlist; k past the corpus returns the whole corpus ranked") {
    val e = emb.select(col("id"), col("vec").as("vec_title"),
      reverse(col("vec")).as("vec_body"))
    seeds.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val qn = 1 + rng.nextInt(3)
      val q = Tables.embeddings(spark, sf)
        .where(col("vec_id") < qn)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val width = 5 + rng.nextInt(20)
      val pre = Knn.topK(
        e.select(col("id"), col("vec_title").as("vec")), q, width,
        Knn.Metric.Cosine)
      val shortlist = pre.select("qid", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rescored = pre.select("qid", "nn_id")
        .join(e.select(col("id").as("nn_id"), col("vec_body")), "nn_id")
        .join(broadcast(q), "qid")
        .select(col("qid"),
          (-graft.functions.VectorDistance.cosine(
            col("vec_body"), col("qvec"))).as("key"),
          col("nn_id").as("id"))
        .where(col("key").isNotNull)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("key"), col("id"))
      val out = rescored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= width + 50)
        .select(col("qid"), col("rk"), col("id")).collect()
      assert(out.nonEmpty)
      assert(out.forall(r =>
        shortlist((r.getLong(0), r.getLong(2)))),
        s"seed $seed: rescore surfaced an id outside its prefetch " +
          "shortlist")
      // k past the shortlist pads nothing: exactly |shortlist| rows
      // per qid survive
      val perQ = out.groupBy(_.getLong(0)).view.mapValues(_.length)
      assert(perQ.values.forall(_ == width),
        s"seed $seed: k past the corpus padded or dropped rows")
    }
  }

  test("dbsf fusion: a zero-variance leg contributes exactly 0.5 " +
    "to every member") {
    import spark.implicits._
    seeds.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val n = 3 + rng.nextInt(5)
      val tied = 100L + rng.nextInt(900) // every bm candidate ties
      val legs = ((0 until n).map(i => (0L, i.toLong, tied, "bm")) ++
        (0 until n).map(i => (0L, i.toLong, (i * 37 + seed).toLong,
          "cos")))
        .toDF("qid", "doc_id", "m", "leg")
      val fused = graft.operators.Search.dbsfFuse(legs)
        .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
      // subtract the varying cos leg's contribution by fusing it
      // alone: the delta per doc must be exactly 0.5
      val cosOnly = graft.operators.Search.dbsfFuse(
          legs.where(col("leg") === "cos"))
        .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
      // both sides are 4dp-rounded emissions, so the delta can carry
      // up to one ulp of the rounding grid on each side
      cosOnly.foreach { case (doc, c) =>
        assert(math.abs(fused(doc) - c - 0.5) < 2e-4,
          s"seed $seed: tied leg contributed ${fused(doc) - c}, not 0.5")
      }
    }
  }

  test("weighted fusion: a doc present only in the dense leg never " +
    "outranks by more than the 0.7 cap; leg maxima score exactly " +
    "their weight") {
    import spark.implicits._
    seeds.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val n = 4 + rng.nextInt(4)
      val legs = ((0 until n).map(i =>
        (0L, i.toLong, (rng.nextInt(5000) + i).toLong, "bm")) ++
        (0 until n).map(i =>
          (0L, (i + n).toLong, (rng.nextInt(5000) + i).toLong, "cos")))
        .toDF("qid", "doc_id", "m", "leg")
      val out = graft.operators.Search.weightedFuse(legs).collect()
        .map(r => r.getLong(2) -> r.getDouble(3)).toMap
      // disjoint doc sets: every bm-only doc <= 0.3, every cos-only
      // doc <= 0.7, and each leg's max-scored doc hits its weight
      // EXACTLY (the integer-rational emission has no fp residue)
      val bmMax = out.filterKeys(_ < n).values.max
      val cosMax = out.filterKeys(_ >= n).values.max
      assert(bmMax == 0.3 && cosMax == 0.7,
        s"seed $seed: leg maxima $bmMax/$cosMax != exact weights")
      assert(out.filterKeys(_ < n).values.forall(_ <= 0.3) &&
        out.filterKeys(_ >= n).values.forall(_ <= 0.7),
        s"seed $seed: a normalized score exceeded its leg weight")
    }
  }
}
