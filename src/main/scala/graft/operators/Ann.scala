package graft.operators

import graft.Tables
import graft.functions.VectorDistance
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search — the Spark-scale
  * re-expression of the reference's HNSW path
  * (reference hnswlib_index.cc:28 insert/search with M=16, efC=200).
  *
  * A navigable small-world graph is a pointer-chasing structure that
  * cannot be traversed as a relational plan; what survives the
  * translation to 100 TB is the IDEA: prune the candidate set before
  * exact scoring. Two standard bulk formulations:
  *
  *  - IVF (inverted file): coarse-quantize the corpus into cells,
  *    search only the `nprobe` cells nearest each query. The cell
  *    assignment is a partition key, so a probe is a partition-pruned
  *    equi-join instead of a full scan.
  *  - Sign-LSH: hash vectors by the sign pattern of dot products with
  *    fixed random hyperplanes; candidate generation is a
  *    co-partitioned equi-join on (table, signature).
  *
  * Both stay deterministic: IVF centroids come from a fixed-stride
  * corpus subsample (no RNG), LSH hyperplanes from an md5-seeded
  * deterministic generator — so specs can assert recall exactly and
  * reruns are reproducible.
  */
object Ann {

  // ---------------------------------------------------------------- IVF

  /** Deterministic coarse centroids: every `stride`-th vector. A
    * k-means|| fit would give tighter cells at the same plan shape;
    * the IVF mechanics (assign → prune → exact-score) are identical.
    */
  def ivfCentroids(emb: DataFrame, stride: Long = 200): DataFrame =
    emb.where(col("id") % stride === 0)
      .select(col("id").as("cell"), col("vec").as("cvec"))

  /** Lloyd-refined centroids: stride-sample init, `iters` rounds of
    * assign → per-cell per-dimension mean. Means are computed by
    * posexplode + groupBy(cell, dim) — fully distributed, no vector
    * ever on the driver — and ROUNDED to 6dp so the result is
    * independent of floating-sum order (the usual reason distributed
    * k-means is nondeterministic; determinism is what lets AnnSpec
    * assert equality across runs).
    */
  def kmeansCentroids(emb: DataFrame, stride: Long = 200,
                      iters: Int = 2): DataFrame = {
    var cents = ivfCentroids(emb, stride)
    for (_ <- 1 to iters) {
      val assigned = ivfAssign(emb, cents)
      cents = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(round(avg(col("x")), 6).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell"),
          expr("transform(dm, p -> cast(p.m AS float))").as("cvec"))
    }
    cents
  }

  /** Centroids as driver-side literals — the k-row object FAISS and
    * MLlib's k-means hold between Lloyd iterations. Sorted by cell so
    * the generated expression (and thus the plan) is deterministic.
    */
  private[operators] def collectCentroids(centroids: DataFrame): Array[(Long, Array[Float])] =
    centroids.select(col("cell"), col("cvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Per-row (negated-cosine distance, cell) struct array against the
    * literal centroid set, for argmin/ranking projections. NULL
    * distances (zero-norm / dim-mismatch) coalesce to 2.0 — strictly
    * worse than any real negated cosine in [-1, 1] — so degenerate
    * vectors deterministically land in the lowest-numbered cell (the
    * argmin's (cd, cell) tiebreak picks the smallest cell id among
    * the all-equal 2.0 distances) rather than poisoning the struct
    * ordering with nulls.
    *
    * Norm factoring: the row norm is computed once per row and each
    * centroid's norm is a DRIVER-computed double literal — the fused
    * VecCosine form re-accumulated both norms inside all k entries.
    * Same float ops in the same order as the pairwise kernels, so
    * the distances (and the argmin) are bit-identical.
    */
  private[operators] def centroidDists(vec: org.apache.spark.sql.Column,
                            cents: Array[(Long, Array[Float])]) =
    // r16: the fused loop kernel replaces the k-way unrolled
    // array(struct(VecDot(vec, typedlit), …)) form — with stride-200
    // seeding the cell count grows with the corpus, and past ~150
    // cells the unrolled generated code crossed Janino's 64 KB method
    // limit, dropping the whole assignment stage to interpreted
    // evaluation (the SCALE_r15 ann_ivf_spill x16 superlinearity;
    // measured 43 s warm → interpreted vs ~2 s in codegen). Same
    // float ops in the same order, so distances (and every oracle
    // hash downstream) are bit-identical — see CentroidDistances.
    graft.functions.VectorDistance.centroidDists(
      vec, cents.map(_._1).toSeq, cents.map(_._2.toSeq))

  /** Sorted nearest-`m` prefix of [[centroidDists]] — the form every
    * consumer actually wants (`slice(array_sort(…), 1, m)` /
    * `array_min` = m 1). One fused selection pass, no k-sized
    * per-row array, no sort: see CentroidTopM for the exact-ordering
    * contract that keeps the replacement hash-identical.
    */
  private[operators] def centroidTopM(vec: org.apache.spark.sql.Column,
                            cents: Array[(Long, Array[Float])], m: Int) =
    graft.functions.VectorDistance.centroidTopM(
      vec, cents.map(_._1).toSeq, cents.map(_._2.toSeq), m)

  /** Assign every vector to its nearest centroid — ONE projection,
    * zero exchanges: `array_min` over the k-element literal struct
    * array picks lexicographic min (cd, cell), the same argmin +
    * tiebreak the round-2 `crossJoin ⋈ groupBy(id) min_by` form
    * computed by shuffling the entire corpus (its grouping key was
    * unique, so map-side combine reduced nothing and the exchange
    * carried every vector — 3× per ivf query across Lloyd iterations).
    * The quantizer metric matches the search metric (cosine), as FAISS
    * ties the IVF quantizer to the index metric. Collecting k rows to
    * the driver is the broadcast; at k beyond a few thousand the same
    * projection would move to a broadcast-variable-backed codegen
    * expression, not back to a shuffle.
    */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame =
    assignTo(emb, collectCentroids(centroids))

  /** The one assignment projection, shared by assign/search/build so
    * the three paths cannot drift (AnnSpec's indexed ≡ in-memory
    * equality depends on byte-identical assignment).
    */
  private[operators] def assignTo(emb: DataFrame,
                       cents: Array[(Long, Array[Float])]): DataFrame =
    // col("*") keeps metadata columns (label, …) riding along into a
    // persisted index, where they serve filtered search — downstream
    // plans select by name, so unused extras prune away at the scan
    kernelSpread(emb, cents.length).select(col("*"),
      centroidTopM(col("vec"), cents, 1)
        .getItem(0).getField("cell").as("cell"))

  /** Width pin for the corpus-side assignment kernel, conditioned on
    * COMPUTE DENSITY: AQE's size-first coalescing (GraftSession, r15)
    * sizes reducer counts by exchange BYTES, but this stage's work is
    * rows × cells × dims — with stride-200 seeding the cell count
    * grows with the corpus, so past ~64 cells the byte proxy
    * underestimates the stage by an order of magnitude and the
    * coalescer funnels a multi-G-MAC projection into one task
    * (measured on the x16 replica: dedup_semdedup 3.5 s size-first vs
    * 1.4 s at core width, same plan otherwise). Same argument as
    * [[Tables.documents]]' explode-bound width pin, but decided HERE
    * because the threshold needs the trained cell count, which only
    * the operator knows at plan time. At the bench SFs (≤ 10 cells)
    * the coalescible form keeps the r15 substrate-floor win; the
    * round-robin spread needs no key and every downstream consumer
    * re-shuffles on cell/id anyway.
    */
  private def kernelSpread(df: DataFrame, k: Int): DataFrame =
    if (k < 64) df
    else df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Shared exact-rerank tail: per-query bounded top-k over scored
    * candidates via the partial-aggregating heap.
    */
  private[operators] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val agg = TopKAgg.topK(k)
    scored.groupBy("qid")
      .agg(agg(col("key"), col("id")).as("top"))
      .select(col("qid"), posexplode(col("top.items")))
      .select(col("qid"), (col("pos") + 1).as("rk"),
        col("col.id").as("nn_id"), round(-col("col.key"), 4).as("score"))
      .orderBy("qid", "rk")
  }

  /** IVF search: per query, rank cells by centroid distance, keep the
    * `nprobe` nearest, and run the exact TopK kernel only against
    * vectors assigned to those cells — the scan prunes to
    * nprobe/ncells of the corpus, which at 100 TB is the difference
    * between touching 2 partitions and touching 1000.
    */
  def ivfSearch(emb: DataFrame, queries: DataFrame, k: Int,
                nprobe: Int = 2, stride: Long = 200): DataFrame =
    ivfSearchWith(emb, queries, k, nprobe,
      collectCentroids(kmeansCentroids(emb, stride)))

  /** The search plan given already-trained centroids — shared by
    * [[ivfSearch]] (trains inline) and [[ivfQuery]] (trains once per
    * (dir, stride) via [[centCache]]), so the two cannot drift.
    */
  private def ivfSearchWith(emb: DataFrame, queries: DataFrame, k: Int,
                            nprobe: Int,
                            cents: Array[(Long, Array[Float])]): DataFrame = {
    val assigned = assignTo(emb, cents)
    // probe cells per query by the same literal-centroid projection:
    // sort the k (cd, cell) structs, slice the nprobe best — no
    // crossJoin, no window shuffle
    val probes = queries.select(col("qid"), col("qvec"),
      explode(centroidTopM(col("qvec"), cents, nprobe)).as("p"))
      .select(col("qid"), col("qvec"), col("p.cell").as("cell"))
    // equi-join on cell co-locates each query with its probed cells;
    // NULL scores (zero-norm / dim-mismatch) drop before the heap —
    // ScoredId.key is a primitive Double
    val scored = assigned.join(probes, "cell")
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(scored, k)
  }

  // ------------------------------------------------- persisted IVF index

  private[operators] def centroidsPath(indexPath: String): String =
    indexPath + "_centroids"

  /** Persist the IVF index: the assigned corpus written as parquet
    * PARTITIONED BY CELL, centroids alongside. This is the physical
    * layout the on-the-fly [[ivfSearch]] only simulates: with cell as
    * a partition directory, a probe becomes PARTITION PRUNING — the
    * scan for a 2-cell probe never lists, opens, or reads the other
    * 998 cells' files. The reference builds its index in memory at
    * startup (vector_database.cc reload); at 100 TB the index IS the
    * table layout.
    */
  def ivfBuildIndex(s: SparkSession, emb: DataFrame, path: String,
                    stride: Long = 200): Unit = {
    import s.implicits._
    val cents = collectCentroids(kmeansCentroids(emb, stride))
    // centroids FIRST, index second: existence checks key on the
    // index's _SUCCESS (written last), so a crash between the two
    // writes can never publish an index whose centroids are missing
    cents.toSeq.toDF("cell", "cvec")
      .write.mode("overwrite").parquet(centroidsPath(path))
    // planner-stats sidecar rides the build (the build is already a
    // full-corpus job; ANALYZE piggybacks for free)
    writePlanStats(s, emb, path)
    writeCellPartitioned(assignTo(emb, cents), path)
  }

  /** The one bulk cell-partitioned index write. `partitionBy("cell")`
    * alone makes every WRITE TASK open one file per cell it holds —
    * with the round-robin kernelSpread feeding it, that is
    * width × cells files (x16 replica: 32 × 160 = 5,120), and since
    * stride-200 seeding grows the cell count with the corpus the
    * commit overhead grows ∝ corpus × width — the superlinear piece
    * of the OPQ cold build (OpqDiag: build 7.8s at x4 → 56.6s at
    * x16, 7.2× on 4× data, with the codebook/moments phases linear).
    * Hashing ON THE CELL first sends each cell to exactly one task:
    * file count = cell count (corpus-proportional, the linear claim)
    * and the at-rest layout becomes one file per cell — which is
    * also what the partition-pruned probes want to read at 100 TB
    * (one cell = one file, not one cell = width shards). Cell size
    * is bounded ~200 by the seeding, so the per-task write is flat
    * and the added exchange carries what the write was already
    * spilling through the committer.
    */
  private[operators] def writeCellPartitioned(df: DataFrame,
                                              path: String): Unit =
    df.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  // -------------------------------------------- planner statistics

  /** Deterministic 1-in-[[planSampleMod]] hash sample: md5 of the id
    * keeps the sample uncorrelated with value/modulo predicates (a
    * stride sample id%S would alias against filters like id%4) and is
    * bit-identical in DuckDB, so the PLANNER is oracle-mirrorable.
    */
  private[operators] val planSampleMod = 8L
  private def planSampled(idCol: org.apache.spark.sql.Column) =
    conv(substring(md5(idCol.cast("string")), 1, 15), 16, 10)
      .cast("long") % planSampleMod === 0
  private[operators] def planStatsPath(indexPath: String): String =
    indexPath + "_planstats"

  /** Write the planning sidecar beside the index: the hash-sampled
    * METADATA rows (vectors dropped — the sample is bytes-tiny) plus
    * the exact build-time total as a constant column. Refreshed at
    * build/recluster; upserts may leave it stale — a planner runs on
    * order-of-magnitude stats, the 10× selFactor gate absorbs drift
    * (re-ANALYZE = rebuild the sidecar).
    */
  private def writePlanStats(s: SparkSession, emb: DataFrame,
                             path: String): Unit = {
    import s.implicits._
    val total = emb.count()
    val sample = emb.drop("vec").where(planSampled(col("id")))
    // meta row separate from the sample rows: a zero-match sample
    // must still carry the total
    Seq((total, planSampleMod)).toDF("total", "sample_mod")
      .write.mode("overwrite").parquet(path + "_planstats_meta")
    sample.coalesce(1).write.mode("overwrite").parquet(planStatsPath(path))
  }

  /** Search a persisted index: probe cells come from the stored
    * centroids, and their union becomes a LITERAL partition filter on
    * the index scan (visible as `PartitionFilters` in the plan) —
    * followed by the same co-located probe join and exact rerank as
    * the in-memory path. Same centroids → identical results to
    * [[ivfSearch]] at the same stride/nprobe.
    */
  def ivfSearchIndexed(s: SparkSession, path: String, queries: DataFrame,
                       k: Int, nprobe: Int = 2,
                       filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(path)).select(col("cell"), col("cvec")))
    val probes = queries.select(col("qid"), col("qvec"),
      explode(centroidTopM(col("qvec"), cents, nprobe)).as("p"))
      .select(col("qid"), col("qvec"), col("p.cell").as("cell"))
    // the probed cell set — a tiny job over the QUERY set only —
    // becomes the pruning predicate on the corpus scan. Driver-side
    // bound: ≤ queries × nprobe cell ids (requests are broadcast-
    // sized by contract), independent of corpus size
    val cells = probes.select("cell").distinct().collect().map(_.getLong(0))
    // the reference pre-filters its approximate search with roaring
    // bitmaps (filter_index.cc:62 under hnswlib_index.cc search);
    // here a metadata predicate COMPOSES with partition pruning — the
    // scan skips unprobed cells by directory and non-matching rows by
    // PushedFilters, strictly less IO than a post-filter. Recall
    // caveat is the reference's too: k is filled from PROBED cells
    // only, so a highly selective filter may return < k rows.
    val pruned = s.read.parquet(path)
      .where(col("cell").isin(cells.toIndexedSeq: _*))
    val idx = filter.map(pruned.where).getOrElse(pruned)
    val scored = idx.join(probes, "cell")
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(scored, k)
  }

  // ------------------------------------------------- persisted IVF+MRL

  /** IVF + Matryoshka prefix: the index carries `pre` (the first
    * `prefixDims` dimensions) as its OWN column beside the full
    * vector, so the probe scan reads (id, pre) only — at 64→16 dims,
    * 4× less scan bandwidth stacked on partition pruning, with no
    * codebook to train (the property Matryoshka-trained embeddings
    * are built for). Same compounding as the SQ8/PQ/BQ index rungs,
    * by column layout instead of codes.
    *
    * MAINTENANCE SCOPE: the generic [[ivfIndexUpsert]]/[[ivfCompact]]
    * rewrite touched cells as (id, vec, cell) — they would drop this
    * layout's derived `pre` column. Refreshing an MRL index is a
    * rebuild (cheap: `pre` is a slice, no training), or an upsert
    * variant that recomputes the slice for rewritten cells.
    */
  def ivfMrlBuildIndex(s: SparkSession, emb: DataFrame, path: String,
                       stride: Long = 200, prefixDims: Int = 16): Unit = {
    import s.implicits._
    val cents = collectCentroids(kmeansCentroids(emb, stride))
    cents.toSeq.toDF("cell", "cvec")
      .write.mode("overwrite").parquet(centroidsPath(path))
    writeCellPartitioned(assignTo(emb, cents)
      .withColumn("pre", slice(col("vec"), 1, prefixDims)), path)
  }

  /** Probe-pruned prefix search: scan 1 reads (id, pre) for probed
    * cells only (ReadSchema excludes the full vectors), cosine over
    * the prefix shortlists k·rerank, scan 2 reads the full vectors
    * just for the shortlist join — the [[ivfSq8Search]] anatomy with
    * a column slice in place of a quantizer.
    */
  def ivfMrlSearch(s: SparkSession, path: String, queries: DataFrame,
                   k: Int, nprobe: Int = 2, rerank: Int = 4,
                   prefixDims: Int = 16): DataFrame = {
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(path)).select(col("cell"), col("cvec")))
    val probes = queries.select(col("qid"),
      explode(centroidTopM(col("qvec"), cents, nprobe)).as("p"),
      slice(col("qvec"), 1, prefixDims).as("qpre"))
      .select(col("qid"), col("qpre"), col("p.cell").as("cell"))
    val cells = probes.select("cell").distinct().collect().map(_.getLong(0))
    val pres = s.read.parquet(path)
      .where(col("cell").isin(cells.toIndexedSeq: _*))
      .select("id", "pre", "cell")
    val scored = pres.join(probes, "cell")
      .select(col("qid"),
        (-VectorDistance.cosine(col("pre"), col("qpre"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    val shortlist = TopKAgg.shortlist(scored, k * rerank)
    val vecs = s.read.parquet(path)
      .where(col("cell").isin(cells.toIndexedSeq: _*))
      .select("id", "vec")
    val rescored = shortlist
      .join(vecs, "id")
      .join(broadcast(queries.select("qid", "qvec")), "qid")
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(rescored, k)
  }

  def ivfMrlQuery(s: SparkSession, dir: String): DataFrame = {
    val path = graft.IndexCache.dirFor(dir, "ivfmrl").toString
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      ivfMrlBuildIndex(s, e, path)
    }
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    ivfMrlSearch(s, path, q, k = 10)
  }

  // ------------------------------------------------------------ sign-LSH

  /** Deterministic pseudo-random hyperplanes: component d of plane p
    * in table t is derived from md5("t|p|d") mapped to [-1, 1]. Pure
    * function of indices — no RNG state, identical on every executor
    * and every run.
    */
  def hyperplanes(tables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables, bits, dim) { (t, p, d) =>
      val h = md.digest(s"$t|$p|$d".getBytes("UTF-8"))
      val v = java.nio.ByteBuffer.wrap(h).getInt & 0x7fffffff
      v.toDouble / Int.MaxValue * 2.0 - 1.0
    }
  }

  /** Per-vector LSH signatures, long format (id, table, sig): bit p of
    * `sig` is the sign of <vec, plane_p>. All dot products run through
    * the fused codegen kernel against literal plane arrays.
    */
  def lshSignatures(emb: DataFrame, vecCol: String, idCol: String,
                    tables: Int = 4, bits: Int = 4, dim: Int = 64): DataFrame = {
    val hp = hyperplanes(tables, bits, dim)
    val sigCols = (0 until tables).map { t =>
      val bitsSum = (0 until bits).map { p =>
        when(VectorDistance.dot(col(vecCol), typedlit(hp(t)(p))) > 0,
          lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t.toLong).as("table"), bitsSum.as("sig"))
    }
    emb.select(col(idCol).as("id"), explode(array(sigCols: _*)).as("ts"))
      .select(col("id"), col("ts.table").as("table"), col("ts.sig").as("sig"))
  }

  /** LSH search: candidates = vectors sharing any (table, signature)
    * bucket with the query, then exact re-rank of only those — the
    * crossJoin of flat search becomes a co-partitioned equi-join.
    * Defaults (4 tables x 4 bits) suit the small test corpus — at
    * production N, `bits` grows ~log2(N/target-bucket-size) and
    * recall is bought with more tables, same plan shape.
    */
  def lshSearch(emb: DataFrame, queries: DataFrame, k: Int,
                tables: Int = 4, bits: Int = 4, dim: Int = 64): DataFrame = {
    val dataSig = lshSignatures(emb, "vec", "id", tables, bits, dim)
    val querySig = lshSignatures(
      queries.select(col("qid").as("id"), col("qvec")), "qvec", "id",
      tables, bits, dim)
      .select(col("id").as("qid"), col("table"), col("sig"))
    val cand = dataSig.join(querySig, Seq("table", "sig"))
      .select("qid", "id").distinct()
    val scored = cand
      .join(emb, "id")
      .join(queries, "qid")
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(scored, k)
  }

  /** Multi-probe LSH (Lv et al., VLDB'07): besides the query's own
    * bucket in each table, probe the `bits` neighboring buckets at
    * Hamming distance 1 (one sign flipped) — near-misses where the
    * query sits close to one hyperplane land exactly there. Buys
    * recall WITHOUT more tables (probes × tables bucket lookups vs
    * tables× more signature storage + scan); same co-partitioned
    * equi-join plan, the probe expansion is query-side only
    * (bits+1 rows per query per table — request-sized).
    */
  def lshSearchMultiprobe(emb: DataFrame, queries: DataFrame, k: Int,
                          tables: Int = 4, bits: Int = 4,
                          dim: Int = 64): DataFrame = {
    val dataSig = lshSignatures(emb, "vec", "id", tables, bits, dim)
    val probeSigs = (0 until bits).map(p =>
      col("sig").bitwiseXOR(lit(1L << p))) :+ col("sig")
    val querySig = lshSignatures(
      queries.select(col("qid").as("id"), col("qvec")), "qvec", "id",
      tables, bits, dim)
      .select(col("id").as("qid"), col("table"),
        explode(array(probeSigs: _*)).as("sig"))
    val cand = dataSig.join(querySig, Seq("table", "sig"))
      .select("qid", "id").distinct()
    val scored = cand
      .join(emb, "id")
      .join(queries, "qid")
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(scored, k)
  }

  // --------------------------------------------------- query-map surface

  /** Trained-centroid cache for the in-memory surface query. K-means
    * training is the index BUILD step; retraining inside every search
    * charged ~2 Lloyd corpus passes per invocation, so the bench
    * entry priced training, not search (r4 verdict #8). One train per
    * (dir, stride) — the same amortization the persisted-index path
    * gets from its one-time build. Results are unchanged: training is
    * deterministic (stride init, 6dp-rounded means), so the cached
    * centroids equal what a fresh train would produce.
    */
  private val centCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), Array[(Long, Array[Float])]]()

  /** The per-(dir, stride=200) trained centroid set, shared across
    * every operator that clusters this corpus (IVF search, spill
    * layout, SemDeDup) — one training run per dir, identical cells
    * everywhere, so cluster-blocked operators are directly
    * comparable with the index paths.
    */
  private[operators] def cachedCentroids(
      s: SparkSession, dir: String): Array[(Long, Array[Float])] = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
  }

  def ivfQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    ivfSearchWith(e, q, k = 10, nprobe = 2, cents)
  }

  /** MARGIN-GATED SPILLED-ASSIGNMENT IVF (the SOAR/ScaNN replication
    * idea — Sun et al., NeurIPS'23: store a BOUNDARY vector in its
    * two nearest cells so it is findable from either side) probed
    * with a SINGLE cell per query. The r12 refinement is SOAR's
    * actual win: replication is gated on the first-vs-second-centroid
    * MARGIN (cd₂ − cd₁ < [[SpillTau]], negated-cosine units) — a
    * vector deep inside its own cell never needed the copy, so gating
    * trims the far-margin tail and the spilled cells stop paying for
    * it. Measured on the driver data (sf0.01): gated spill@1 reaches
    * recall 0.88 — equal to FULL spill@1 and above ivf@2's 0.86 — at
    * 1682 scanned rows, STRICTLY below ivf@2's 1694 (the full layout
    * scanned 1724; `ann_spill_recall` ships all four variants so the
    * trade stays visible). The trade is explicit and 100-TB-shaped —
    * the index is (1+replicated-share)× corpus rows (storage, paid
    * once, partitioned by cell like any IVF layout) against HALF the
    * per-query probe fan-out (latency, paid every search). Same
    * cached centroids as `ann_ivf`, so the layouts are directly
    * comparable; with nprobe=1 a (qid, id) pair cannot duplicate (an
    * id appears once per cell), so no dedup stage is needed before
    * the heap. The margin is a pure double subtract of the same cd
    * both engines already order by, so the gate replays bit-identically
    * in the oracle's margin CTE.
    */
  def ivfSpillQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    spillSearchWith(e, q, 10, cents, SpillTau)
  }

  /** Boundary-margin bar for spilled replication, in negated-cosine
    * units: replicate into the second cell only when
    * cd₂ − cd₁ < 0.4. Chosen on the margin distribution of the
    * driver embeddings (the gate trims the ~p93+ tail at sf0.01)
    * as the largest trim that keeps full-spill recall — see
    * [[spillRecallReport]] for the shipped evidence.
    */
  private[operators] val SpillTau = 0.4

  /** The spilled layout: first cell always; second cell only for
    * vectors within `tau` of the boundary. Degenerate (zero-norm)
    * vectors, whose centroid dists ALL coalesce to 2.0, carry margin
    * cd₂−cd₁ = 0 and therefore always replicate into the
    * second-lowest cell — the oracle's margin CTE mirrors this, and
    * the replicas inflate spill scan counts by the degenerate share
    * (zero on the driver data; a corpus with many zero vectors should
    * drop them at ingest, the embed_norm_audit gate).
    */
  private def spillAssign(e: DataFrame, cents: Array[(Long, Array[Float])],
                          tau: Double): DataFrame = {
    val ranked = kernelSpread(e, cents.length).select(col("id"), col("vec"),
      centroidTopM(col("vec"), cents, 2).as("p2"))
    val first = ranked.select(col("id"), col("vec"),
      col("p2").getItem(0).getField("cell").as("cell"))
    val second = ranked
      .where((col("p2").getItem(1).getField("cd")
        - col("p2").getItem(0).getField("cd")) < tau)
      .select(col("id"), col("vec"),
        col("p2").getItem(1).getField("cell").as("cell"))
    first.unionByName(second)
  }

  private def spillSearchWith(e: DataFrame, q: DataFrame, k: Int,
                              cents: Array[(Long, Array[Float])],
                              tau: Double): DataFrame = {
    val probes = q.select(col("qid"), col("qvec"),
      explode(centroidTopM(col("qvec"), cents, 1))
        .as("p"))
      .select(col("qid"), col("qvec"), col("p.cell").as("cell"))
    val scored = spillAssign(e, cents, tau).join(probes, "cell")
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(scored, k)
  }

  /** THE SOAR TRADE QUANTIFIED — recall@10 AND scan cost for FOUR
    * layouts over the same centroids: plain IVF at nprobe=1, plain
    * IVF at nprobe=2, the FULL spilled layout at nprobe=1, and the
    * margin-gated spill at nprobe=1 ([[SpillTau]] — r12). The honest
    * question a capacity planner asks: does replicated storage at 1
    * probe buy the recall of 2 probes, and at what per-query scan
    * cost (Σ probed-cell sizes — the rows the heap must score)? The
    * shipped answer at sf0.01: spill_m1 = 0.88 recall / 1682 rows —
    * above ivf_p2 (0.86 / 1694) on BOTH axes, and equal-recall /
    * cheaper-scan vs spill_p1 (0.88 / 1724): the far-margin replicas
    * the gate drops were pure scan cost. Recall closes over exact
    * integer hit counts against the brute-force top-10 (one
    * division); scan cost is an exact integer sum over
    * probe×cell-size joins. Every leg is anchored by a literal
    * variant frame (left join + coalesce — the ivfRecallCurve
    * zero-anchor rule), so a zero-hit leg reports 0.0, not an absent
    * row. Scale: legs share the memoized centroids; the exact leg is
    * the one corpus-wide pass.
    */
  def spillRecallReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val nq = q.count()
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    val exact = Knn.topK(e, q, 10, Knn.Metric.Cosine)
      .select(col("qid"), col("nn_id")).localCheckpoint(true)
    val legs = Seq(
      ("ivf_p1", ivfSearchWith(e, q, 10, 1, cents)),
      ("ivf_p2", ivfSearchWith(e, q, 10, 2, cents)),
      ("spill_p1", spillSearchWith(e, q, 10, cents, Double.MaxValue)),
      ("spill_m1", spillSearchWith(e, q, 10, cents, SpillTau)))
    val results = legs.map { case (n, df) =>
      df.select(lit(n).as("variant"), col("qid"), col("nn_id"))
    }.reduce(_ unionByName _)
    val hits = results.join(exact, Seq("qid", "nn_id"), "left_semi")
      .groupBy("variant").agg(count(lit(1)).as("hits"))
    val cellSizes = assignTo(e, cents).groupBy("cell")
      .agg(count(lit(1)).as("cn"))
    def spillSizes(tau: Double) = spillAssign(e, cents, tau)
      .groupBy("cell").agg(count(lit(1)).as("cn"))
    def probesOf(np: Int) = q.select(col("qid"),
      explode(centroidTopM(col("qvec"), cents, np))
        .as("p"))
      .select(col("qid"), col("p.cell").as("cell"))
    val scanned = Seq(
      ("ivf_p1", probesOf(1).join(cellSizes, "cell")),
      ("ivf_p2", probesOf(2).join(cellSizes, "cell")),
      ("spill_p1", probesOf(1).join(spillSizes(Double.MaxValue), "cell")),
      ("spill_m1", probesOf(1).join(spillSizes(SpillTau), "cell")))
      .map { case (n, df) => df.select(lit(n).as("variant"), col("cn")) }
      .reduce(_ unionByName _)
      .groupBy("variant").agg(sum("cn").as("scanned_rows"))
    Seq("ivf_p1", "ivf_p2", "spill_m1", "spill_p1").toDF("variant")
      .join(hits, Seq("variant"), "left")
      .join(scanned, Seq("variant"), "left")
      .select(col("variant"), lit(nq).as("n_queries"),
        round(coalesce(col("hits"), lit(0L)).cast("double")
          / (lit(10L) * nq), 4).as("mean_recall"),
        coalesce(col("scanned_rows"), lit(0L)).as("scanned_rows"))
      .orderBy("variant")
  }

  /** IVF leg for callers that bring their OWN query frame (e.g. the
    * request-routing batch API, [[SearchApi]]): same cached centroids
    * and probe plan as [[ivfQuery]], so a routed request returns
    * exactly what a direct `ann_ivf` call would.
    *
    * @param queries (qid, qvec)
    */
  def ivfSearchCached(s: SparkSession, dir: String, queries: DataFrame,
                      k: Int, nprobe: Int = 2): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    ivfSearchWith(e, queries, k, nprobe, cents)
  }

  /** CORPUS-WIDE kNN GRAPH — every vector's k nearest neighbors
    * (self excluded), the structure near-dup mining, hard-negative
    * selection, and graph-based label propagation all start from.
    * This is the all-to-all ANN pattern at 100 TB shape: candidates
    * are BLOCKED BY IVF CELL (each node only scores against its
    * nprobe probed cells' members — never N²), the per-node heap
    * keeps the shuffle at N·k, and cell cardinality grows with the
    * corpus so per-cell work stays bounded. Same cached centroids as
    * `ann_ivf`, so graph edges agree with individual index queries.
    *
    * Memoized per (applicationId, dir, k, nprobe): the graph is a
    * deterministic byproduct consumed by five registry operators
    * (the graph itself, mutual pairs, embed clusters, ann_nsw, the
    * routed API's HNSW leg) — checkpoint-backed, so caching the
    * reference spares each consumer the build.
    */
  def knnGraph(s: SparkSession, dir: String, k: Int = 5,
               nprobe: Int = 2): DataFrame =
    graft.ByproductCache.getOrCompute(s.sparkContext.applicationId,
      s"knngraph|$dir|$k|$nprobe") {
      knnGraphUncached(s, dir, k, nprobe).localCheckpoint(true)
    }

  /** Warm the kNN-graph memos two concurrent graph legs share (the
    * routed batch builds its NSW and HIER legs from a thread pool —
    * graft.Par — and ByproductCache tolerates a racing double-build,
    * which for the corpus-scale graph would mean paying the build
    * twice; touching the memos once before forking makes the race a
    * cache hit).
    */
  private[graft] def warmGraphMemos(s: SparkSession, dir: String,
                                    graphK: Int): Unit = {
    val g = knnGraph(s, dir, graphK)
      .select(col("qid").as("src"), col("nn_id").as("dst"))
    graft.ByproductCache.getOrCompute(
      s.sparkContext.applicationId, s"nswedges|$dir|$graphK") {
      g.union(g.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(true)
    }
    ()
  }

  private def knnGraphUncached(s: SparkSession, dir: String, k: Int,
                               nprobe: Int): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    val assigned = assignTo(e, cents)
    val probes = Tables.embeddings(s, dir)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        explode(centroidTopM(col("embedding"), cents, nprobe)).as("p"))
      .select(col("qid"), col("qvec"), col("p.cell").as("cell"))
    val scored = assigned.join(probes, "cell")
      .where(col("id") =!= col("qid"))
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(scored, k)
  }

  /** Per-request PROBE EFFORT on the IVF index — nprobe as REQUEST
    * DATA, the IVF twin of [[nswSearchEf]]'s ef budget (FAISS exposes
    * nprobe per search call for exactly this: latency-sensitive
    * requests probe one cell, recall-sensitive ones probe more). The
    * per-request width is a COLUMN driving the probe-slice length
    * (`slice(cells, 1, np)` — a codegen projection, no plan change
    * per effort class), so a heterogeneous batch runs as ONE plan
    * whose scan fan-out per request is its own np × cell size.
    * `nprobe_used` is emitted as data (the rounds_used discipline) so
    * the oracle mirrors the same clamp expression. Monotone by
    * construction: a request's np=1 candidate set is the first cell
    * of its np=3 set (AnnSpec pins subset-ness and the
    * homogeneous-batch ≡ fixed-nprobe equivalence).
    *
    * @param reqs (qid, qvec, nprobe) — clamped to [1, maxNprobe]
    */
  def ivfSearchNprobe(s: SparkSession, dir: String, reqs: DataFrame,
                      k: Int, maxNprobe: Int = 4): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    val assigned = assignTo(e, cents)
    val probes = reqs.select(col("qid"), col("qvec"),
        least(greatest(col("nprobe").cast("int"), lit(1)),
          lit(maxNprobe)).as("np"))
      .select(col("qid"), col("qvec"), col("np"),
        // dynamic per-request nprobe: select the constant maxNprobe
        // prefix once, then the row's np-sized sub-slice of it —
        // identical to slicing the full sorted array since np ≤ max
        explode(slice(centroidTopM(col("qvec"), cents, maxNprobe),
          lit(1), col("np"))).as("p"))
      .select(col("qid"), col("qvec"), col("np"), col("p.cell").as("cell"))
    val scored = assigned.join(probes, "cell")
      .select(col("qid"), col("np"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    val agg = TopKAgg.topK(k)
    scored.groupBy("qid", "np")
      .agg(agg(col("key"), col("id")).as("top"))
      .select(col("qid"), col("np"), posexplode(col("top.items")))
      .select(col("qid"), (col("pos") + 1).as("rk"),
        col("col.id").as("nn_id"),
        round(-col("col.key"), 4).as("score"),
        col("np").cast("long").as("nprobe_used"))
      .orderBy("qid", "rk")
  }

  /** Heterogeneous-nprobe surface: even qids probe 1 cell, odd 3. */
  def ivfNprobeQuery(s: SparkSession, dir: String): DataFrame = {
    val reqs = Tables.embeddings(s, dir).where(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        when(col("vec_id") % 2 === 0, 1L).otherwise(3L).as("nprobe"))
    ivfSearchNprobe(s, dir, reqs, k = 10)
  }

  /** MUTUAL-kNN pairs — edges present in BOTH directions of the kNN
    * graph (a ∈ kNN(b) ∧ b ∈ kNN(a)), the high-precision duplicate /
    * same-cluster signal asymmetric kNN lists are noisy on. One
    * self-SEMI-join on the N·k edge table (the graph materializes
    * once — localCheckpoint, the two-consumer rule); canonical
    * a < b orientation halves the output.
    */
  def mutualKnnPairs(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    // knnGraph is already checkpoint-backed (memoized), so the
    // self-join reads the materialized edge table twice for free
    val g = knnGraph(s, dir, k)
      .select(col("qid"), col("nn_id"), col("score"))
    val rev = g.select(col("qid").as("rq"), col("nn_id").as("rn"))
    g.join(rev, col("qid") === col("rn") && col("nn_id") === col("rq"),
        "left_semi")
      .where(col("qid") < col("nn_id"))
      .select(col("qid").as("id_a"), col("nn_id").as("id_b"), col("score"))
      .orderBy("id_a", "id_b")
  }

  /** TRIANGLE COUNT + LOCAL CLUSTERING COEFFICIENT over the
    * mutual-kNN graph — the community-structure diagnostic (a node
    * whose neighbors interlink is inside a tight semantic cluster; a
    * hub with coefficient ~0 chains unrelated neighborhoods — the
    * node dedup/cluster pipelines should distrust). Triangles
    * enumerate as ordered triples a<b<c over the canonical mutual
    * edge list (three equi-joins); because mutual-kNN degree is
    * bounded by k, the edge-edge join fans out at most k per row —
    * O(N·k²) total, never the unbounded wedge explosion a power-law
    * graph would give. Coefficient = 2·triangles / (deg·(deg−1)),
    * integer inputs → identical doubles on both engines.
    */
  def graphTriangles(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val und = mutualKnnPairs(s, dir, k).select("id_a", "id_b")
      .localCheckpoint(true)
    val sym = und.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(und.select(col("id_b").as("a"), col("id_a").as("b")))
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.id_b") === col("e2.id_a"))
      .join(und.as("e3"), col("e1.id_a") === col("e3.id_a") &&
        col("e2.id_b") === col("e3.id_b"))
      .select(col("e1.id_a").as("a"), col("e1.id_b").as("b"),
        col("e2.id_b").as("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    val deg = sym.groupBy(col("a").as("id"))
      .agg(count(lit(1)).as("degree"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id").as("vec_id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          round(coalesce(col("triangles"), lit(0L)).cast("double") * 2
            / (col("degree") * (col("degree") - 1)), 4))
          .otherwise(lit(0.0)).as("clustering"))
      .orderBy("vec_id")
  }

  /** DEGREE ASSORTATIVITY of the mutual-kNN graph — Pearson
    * correlation of endpoint degrees over the symmetric edge list
    * (Newman 2002): positive = hubs link hubs (a core-periphery
    * embedding space), negative = hubs link leaves (star-like
    * clusters — single-link dedup will chain them). Every moment is
    * an exact integer (degrees are bounded by k, the edge list is
    * 2·E rows), so the coefficient is a ratio of exact longs —
    * identical doubles on both engines. One self-join on the edge
    * key, two bounded aggregates.
    */
  def graphAssortativity(s: SparkSession, dir: String,
                         k: Int = 5): DataFrame = {
    val und = mutualKnnPairs(s, dir, k).select("id_a", "id_b")
      .localCheckpoint(true)
    val sym = und.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(und.select(col("id_b").as("a"), col("id_a").as("b")))
    val deg = sym.groupBy(col("a").as("id"))
      .agg(count(lit(1)).as("dg"))
    val pairs = sym
      .join(deg.select(col("id").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("dg").as("db")), "b")
    pairs.agg(count(lit(1)).as("m"), sum("da").as("sa"),
        sum("db").as("sb"), sum(expr("da * db")).as("sab"),
        sum(expr("da * da")).as("saa"), sum(expr("db * db")).as("sbb"))
      .select(col("m").as("n_edges"),
        expr("round((m * sab - sa * sb) * 1.0 / " +
          "(sqrt((m * saa - sa * sa) * 1.0 * (m * sbb - sb * sb))), 4)")
          .as("assortativity"))
  }

  /** kNN-GRAPH QUALITY REPORT — measured recall of the IVF-blocked
    * approximate graph against the exact kNN on a deterministic
    * query sample (vec_id < 50): the graph every downstream family
    * consumes (NSW search, clusters, centrality, link prediction,
    * triangles) is APPROXIMATE — probed cells, not all pairs — and
    * this row says how approximate, the same honesty the recall
    * reports give the search paths. Sampled evaluation keeps the
    * exact side Q×N (never the N² full exact graph), so the probe
    * is cheap at any corpus size while the graph itself is the
    * memoized structure the real queries use.
    */
  /** BFS DISTANCE HISTOGRAM from sampled sources over the mutual-kNN
    * graph — the small-world diagnostic beside k-core and
    * assortativity (hop-count distribution tells you whether graph
    * search can reach a cluster's far side in the beam budget the
    * NSW descent spends): bounded breadth-first expansion, `hops`
    * rounds of frontier⋈edges with a min-dist collapse per round —
    * the dedup_clusters iterate-join discipline, and because mutual
    * degree ≤ k the frontier fan-out is k-bounded per node, never a
    * power-law explosion. Sampled sources keep the visited table
    * S×reachable-sized. All integers; the oracle unrolls the same
    * rounds as chained CTEs.
    */
  def graphBfsHist(s: SparkSession, dir: String, nSrc: Long = 20L,
                   hops: Int = 4): DataFrame = {
    val und = mutualKnnPairs(s, dir).select("id_a", "id_b")
      .localCheckpoint(true)
    val sym = und.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(und.select(col("id_b").as("a"), col("id_a").as("b")))
      .localCheckpoint(true)
    val src = sym.select(col("a").as("node")).distinct()
      .where(col("node") < nSrc)
    var visited = src
      .select(col("node").as("src"), col("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (i <- 1 to hops) {
      val frontier = visited.where(col("dist") === (i - 1).toLong)
        .select(col("src"), col("node").as("fa"))
      val nbrs = frontier.join(sym, col("fa") === col("a"))
        .select(col("src"), col("b").as("node"), lit(i.toLong).as("dist"))
      visited = visited.unionByName(nbrs)
        .groupBy("src", "node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
    }
    visited.where(col("dist") > 0)
      .groupBy("dist").agg(count(lit(1)).as("n_pairs"))
      .orderBy("dist")
  }

  /** TWO-NN INTRINSIC-DIMENSION STATISTIC (Facco et al. 2017) — the
    * embedding-space audit behind index tuning: the distribution of
    * μ = d₂/d₁ (second- over first-neighbor distance) determines the
    * manifold's intrinsic dimension (Pareto with shape = id); a
    * median μ near 1 means a high-dimensional / noise-like space
    * where ANN pruning degrades, far from 1 a low-dimensional
    * manifold the IVF/HNSW structures exploit. Emits the μ quartiles
    * — the raw sufficient statistic — NOT the d = ln2/ln(μ_med)
    * transform (ln is libm; the quartiles carry the same decision).
    *
    * μ from the memoized kNN graph's rk ≤ 2 edges: cosine scores are
    * 4dp-pinned, d = √(2·(1−s)) and the ratio are IEEE-exact off
    * them, exact-duplicate anchors (d₁ = 0) filtered on the exact
    * integer-rounded score. Work beyond the shared graph: one
    * Q×2-row pivot and a 3-quantile fold.
    */
  def twoNnDim(s: SparkSession, dir: String): DataFrame = {
    val g = knnGraph(s, dir).where(col("rk") <= 2)
    val ratios = g.groupBy("qid")
      .agg(max(when(col("rk") === 1, col("score"))).as("s1"),
        max(when(col("rk") === 2, col("score"))).as("s2"))
      .where(col("s1") < 1.0 && col("s2").isNotNull)
      .select(round(
        sqrt((lit(2.0) * (lit(1.0) - col("s2")))
          / (lit(2.0) * (lit(1.0) - col("s1")))), 4).as("mu"))
    ratios.agg(count(lit(1)).as("n_points"),
      round(expr("percentile(mu, 0.25)"), 4).as("mu_p25"),
      round(expr("percentile(mu, 0.5)"), 4).as("mu_med"),
      round(expr("percentile(mu, 0.75)"), 4).as("mu_p75"))
  }

  def knnGraphRecall(s: SparkSession, dir: String, k: Int = 5,
                     nq: Long = 50L): DataFrame = {
    val approx = knnGraph(s, dir, k).where(col("qid") < nq)
      .select("qid", "nn_id")
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val qs = Tables.embeddings(s, dir).where(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Knn.topKExcludingSelf(e, qs, k, Knn.Metric.Cosine)
      .select("qid", "nn_id").localCheckpoint(true)
    val hits = approx.join(exact, Seq("qid", "nn_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    val den = exact.agg(count(lit(1)).as("n_exact"))
    val ne = approx.agg(count(lit(1)).as("n_edges"))
    hits.crossJoin(den).crossJoin(ne)
      .select(lit(nq).as("n_queries"), col("n_edges"), col("n_exact"),
        col("n_hits"),
        round(col("n_hits").cast("double") / col("n_exact"), 4)
          .as("recall"))
  }

  /** NEWMAN MODULARITY per community of the embedding dup-cluster
    * partition — the score that grades what the cluster operator
    * found (Q_c = m_c/m − (d_c/2m)²; a partition totalling near 0
    * means the "clusters" are no better than a random degree-
    * preserving rewiring, a dedup/curation red flag). Communities
    * are [[embedKnnClusters]]' connected components, edges the
    * mutual-kNN list; every moment (m, per-cluster internal edges,
    * degree sums) is an exact integer from bounded-degree tables, so
    * the per-cluster contribution is a pure function of exact longs
    * — identical doubles on both engines. Cost: two key-partitioned
    * joins of the N·k edge table against the cluster map, one
    * aggregate — the clustering fixpoint itself is memoized.
    */
  def graphModularity(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val clusters = embedKnnClusters(s, dir, k)
      .select(col("vec_id").as("id"), col("cluster_id"))
      .localCheckpoint(true)
    val und = mutualKnnPairs(s, dir, k).select("id_a", "id_b")
      .localCheckpoint(true)
    val m = und.agg(count(lit(1)).as("m"))
    val withC = und
      .join(clusters.select(col("id").as("id_a"), col("cluster_id").as("ca")),
        "id_a")
      .join(clusters.select(col("id").as("id_b"), col("cluster_id").as("cb")),
        "id_b")
    val internal = withC.where(col("ca") === col("cb"))
      .groupBy(col("ca").as("cluster_id")).agg(count(lit(1)).as("m_in"))
    val sym = und.select(col("id_a").as("a"))
      .unionByName(und.select(col("id_b").as("a")))
    val deg = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("d"))
    val dc = clusters.join(deg, "id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_nodes"), sum("d").as("d_sum"))
    val x = col("d_sum").cast("double") / (col("m") * 2)
    dc.join(internal, Seq("cluster_id"), "left")
      .crossJoin(broadcast(m))
      .select(col("cluster_id"), col("n_nodes"),
        coalesce(col("m_in"), lit(0L)).as("m_in"), col("d_sum"),
        round(coalesce(col("m_in"), lit(0L)).cast("double") / col("m")
          - x * x, 4).as("q_c"))
      .orderBy("cluster_id")
  }

  /** CONDUCTANCE per embedding cluster — the boundary-leakage twin
    * of [[graphModularity]] (Kannan/Vempala/Vetta's cluster-quality
    * measure; Leskovec's NCP plots made it the standard): φ(C) =
    * cut(C) / min(vol(C), vol(rest)) — a low-conductance cluster is
    * well-separated (its members' kNN edges stay inside), a high one
    * leaks into the rest of the corpus and single-link dedup will
    * chain through it. Every input is an exact integer off the same
    * mutual-graph + fixpoint-cluster byproducts modularity reads
    * (cut edges counted once per SIDE via a two-row explode of each
    * crossing edge; volumes are degree sums), one guarded division —
    * a cluster spanning the whole graph has min-vol 0 and reports
    * NULL, not ∞. Same O(N·k) shapes as modularity.
    */
  def graphConductance(s: SparkSession, dir: String,
                       k: Int = 5): DataFrame = {
    val clusters = embedKnnClusters(s, dir, k)
      .select(col("vec_id").as("id"), col("cluster_id"))
      .localCheckpoint(true)
    val und = mutualKnnPairs(s, dir, k).select("id_a", "id_b")
      .localCheckpoint(true)
    val m = und.agg(count(lit(1)).as("m"))
    val withC = und
      .join(clusters.select(col("id").as("id_a"), col("cluster_id").as("ca")),
        "id_a")
      .join(clusters.select(col("id").as("id_b"), col("cluster_id").as("cb")),
        "id_b")
    val cut = withC.where(col("ca") =!= col("cb"))
      .select(explode(array(col("ca"), col("cb"))).as("cluster_id"))
      .groupBy("cluster_id").agg(count(lit(1)).as("cut_edges"))
    val sym = und.select(col("id_a").as("a"))
      .unionByName(und.select(col("id_b").as("a")))
    val deg = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("d"))
    val dc = clusters.join(deg, "id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_nodes"), sum("d").as("vol"))
    val minVol = least(col("vol"), lit(2L) * col("m") - col("vol"))
    dc.join(cut, Seq("cluster_id"), "left")
      .crossJoin(broadcast(m))
      .select(col("cluster_id"), col("n_nodes"), col("vol"),
        coalesce(col("cut_edges"), lit(0L)).as("cut_edges"),
        when(minVol > 0,
          round(coalesce(col("cut_edges"), lit(0L)).cast("double")
            / minVol, 4))
          .otherwise(lit(null).cast("double")).as("conductance"))
      .orderBy("cluster_id")
  }

  /** ADAMIC-ADAR LINK PREDICTION over the mutual-kNN graph — scores
    * every distance-2 non-adjacent pair (a, c) by Σ_b 1/ln(deg(b))
    * over their common neighbors b (Adamic & Adar 2003): the classic
    * "these two documents SHOULD be linked" signal — a high-scoring
    * non-edge in embedding space is a near-dup the kNN cut missed or
    * a retrieval-expansion candidate. Wedges enumerate as one
    * self-join of the symmetric edge list on the middle node; mutual
    * degree is bounded by k, so fan-out is ≤ k per edge row —
    * O(N·k²) candidates, never a pair explosion (§4 rule). Existing
    * edges drop via a left_anti against the canonical edge table.
    * ln() runs on exact small-int degrees (2..k ≤ 5 wedge middles
    * always have ≥2 edges), so both engines take correctly-rounded
    * libm values; each pair sums ≤ k² such terms.
    */
  def adamicAdar(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val und = mutualKnnPairs(s, dir, k).select("id_a", "id_b")
      .localCheckpoint(true)
    val sym = und.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(und.select(col("id_b").as("a"), col("id_a").as("b")))
    val deg = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("dg"))
    val wedge = sym.select(col("a"), col("b"))
      .join(sym.select(col("a").as("b"), col("b").as("c")), "b")
      .where(col("a") < col("c"))
    val cand = wedge.join(und,
      wedge("a") === und("id_a") && wedge("c") === und("id_b"),
      "left_anti")
    cand.join(deg.select(col("id").as("b"), col("dg")), "b")
      .groupBy(col("a").as("id_a"), col("c").as("id_b"))
      .agg(count(lit(1)).as("n_common"),
        round(sum(lit(1.0) / log(col("dg").cast("double"))), 4)
          .as("aa_score"))
      .orderBy("id_a", "id_b")
  }

  /** K-CORE of the mutual-kNN graph — the density skeleton graph
    * curation reads (the 2-core prunes pendant chains and isolated
    * spokes; what survives is the corpus's tightly-connected mass,
    * the natural seed set for cluster-based dedup review). Classic
    * iterative peeling — drop nodes with degree < k, recompute,
    * repeat — expressed as the repo's bounded convergence-checked
    * fixpoint (the dedup_clusters / adaptive-descent pattern): each
    * round is one semi-join restriction of the edge table + one
    * degree aggregate, the alive set only shrinks, so COUNT equality
    * is set equality and the early stop is exact — which is why the
    * UNROLLED fixed-round mirror matches bit-for-bit (peeling past
    * the fixpoint is the identity). Degree ≤ graph-k bounds each
    * round's work at N·k edge rows; convergence on these graphs
    * takes a handful of rounds (cap 8, spec-checked).
    */
  def graphKCore(s: SparkSession, dir: String, k: Int = 2,
                 graphK: Int = 5, maxRounds: Int = 8): DataFrame = {
    val und = mutualKnnPairs(s, dir, graphK).select("id_a", "id_b")
      .localCheckpoint(true)
    val sym = und.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(und.select(col("id_b").as("a"), col("id_a").as("b")))
      .localCheckpoint(true)
    var alive = sym.select(col("a").as("id")).distinct()
      .localCheckpoint(true)
    var n = alive.count()
    var converged = false
    var r = 0
    while (r < maxRounds && !converged) {
      val e = sym
        .join(alive.select(col("id").as("a")), "a")
        .join(alive.select(col("id").as("b")), "b")
      val next = e.groupBy("a").agg(count(lit(1)).as("dg"))
        .where(col("dg") >= k).select(col("a").as("id"))
        .localCheckpoint(true)
      val m = next.count()
      converged = m == n
      alive = next
      n = m
      r += 1
    }
    sym.join(alive.select(col("id").as("a")), "a")
      .join(alive.select(col("id").as("b")), "b")
      .groupBy(col("a").as("vec_id"))
      .agg(count(lit(1)).as("core_degree"))
      .orderBy("vec_id")
  }

  /** NEIGHBOR-JACCARD LINK PREDICTION over the mutual-kNN graph —
    * the set-overlap companion to [[adamicAdar]] (Liben-Nowell &
    * Kleinberg 2003's second classic score): every distance-2
    * non-adjacent pair (a, c) scored by
    * |N(a)∩N(b)| / |N(a)∪N(c)| = common/(deg_a + deg_c − common).
    * Where Adamic-Adar weights rare hubs, Jaccard normalizes by both
    * endpoints' degrees — high score = two documents whose
    * NEIGHBORHOODS agree, the strongest "merge these near-dup
    * clusters" signal. Same §4 shape as the AA query: wedges via one
    * self-join of the symmetric edge list on the middle node (fan-out
    * ≤ k per edge row, O(N·k²) candidates), existing edges dropped
    * with a left_anti, and the score a pure function of exact integer
    * counts (degrees ≤ k) — one division, identical doubles on both
    * engines.
    */
  def graphJaccardLp(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val und = mutualKnnPairs(s, dir, k).select("id_a", "id_b")
      .localCheckpoint(true)
    val sym = und.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(und.select(col("id_b").as("a"), col("id_a").as("b")))
    val deg = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("dg"))
    val wedge = sym.select(col("a"), col("b"))
      .join(sym.select(col("a").as("b"), col("b").as("c")), "b")
      .where(col("a") < col("c"))
    val cand = wedge.join(und,
      wedge("a") === und("id_a") && wedge("c") === und("id_b"),
      "left_anti")
    cand.groupBy(col("a").as("id_a"), col("c").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(deg.select(col("id").as("id_a"), col("dg").as("dg_a")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("dg").as("dg_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_common"),
        round(col("n_common").cast("double")
          / (col("dg_a") + col("dg_b") - col("n_common")), 4)
          .as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** PAGERANK CENTRALITY over the corpus kNN graph — the
    * graph-importance signal centrality-aware data curation uses
    * (documents whose embeddings many other documents point at are
    * hubs of semantic mass; tails are candidates for up-weighting or
    * inspection). Power iteration with damping 0.85, a FIXED
    * iteration count (T=3) like every bounded fixpoint in this repo.
    *
    * INTEGER-EXACT arithmetic — the float trap here is that
    * p(v) = Σ in-contributions is a float sum whose value depends on
    * aggregation order, which no oracle could reproduce. Instead the
    * scores are scaled integers: S_0 = 1, and with damping 17/20 and
    * out-degrees ≤ 5 (all dividing 60),
    * S_{t+1}(v) = 180·1200^t + Σ_{u→v} S_t(u)·(1020 div deg(u))
    * keeps every term — teleport and edge contribution alike — a
    * Long (1020 = 0.85·1200 is divisible by every degree 1..5;
    * 180 = 0.15·1200). Integer sums are order-independent, so the
    * DuckDB mirror matches bit-for-bit; the ONLY float op is the
    * final division by N·1200^T (exact doubles at these magnitudes),
    * rounded to 6dp. Overflow headroom: Σ_v S_t(v) = N·1200^t, so
    * individual scores stay far below 2^63 for T ≤ 4 at any
    * realistic N (hence the require).
    *
    * Scale shape: per iteration ONE key-partitioned join of the N·k
    * edge table (memoized + checkpointed by [[knnGraph]]) against
    * the N-row score table and one groupBy — both shuffles keyed by
    * node id, no windows, no driver state beyond N and the scale
    * constant. localCheckpoint per iteration severs the lineage the
    * same way the dedup cluster fixpoint does.
    */
  def graphCentrality(s: SparkSession, dir: String,
                      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 4,
      "integer scaling: per-node scores must stay in Long range")
    val edges0 = knnGraph(s, dir).select(col("qid"), col("nn_id").as("id"))
    val deg = edges0.groupBy("qid").agg(count(lit(1)).as("d"))
    val edges = edges0.join(deg, "qid")
      .select(col("qid"), col("id"), expr("1020 div d").as("w"))
      .localCheckpoint(true) // consumed once per iteration
    val nodes = Tables.embeddings(s, dir).select(col("vec_id").as("id"))
    // N from the bare table (metadata-only count — the spread
    // repartition in Tables.embeddings would force a shuffle just to
    // count); the algorithm needs N only for the teleport scale
    val n = Tables.table(s, dir, "embeddings").count()
    var state = nodes.select(col("id"), lit(1L).as("s"))
    var scaleT = 1L // 1200^t
    (0 until iters).foreach { _ =>
      val contrib = edges
        .join(state.select(col("id").as("qid"), col("s")), "qid")
        .groupBy("id").agg(sum(col("s") * col("w")).as("c"))
      state = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(180L * scaleT) + coalesce(col("c"), lit(0L))).as("s"))
        .localCheckpoint(true)
      scaleT *= 1200L
    }
    // N and 1200^T are both exactly representable; their product is
    // one deterministic double, like the final per-row division
    val denom = n.toDouble * scaleT.toDouble
    state.select(col("id").as("vec_id"),
        round(col("s").cast("double") / lit(denom), 6).as("centrality"))
      .orderBy("vec_id")
  }

  /** kNN LABEL PURITY — per label, the fraction of kNN-list
    * neighbors sharing the query's label: the neighborhood-coherence
    * number that PREDICTS [[graft.operators.Classify.knnClassify]]'s
    * accuracy before running it (purity ~1/n_labels means the
    * embedding carries no label signal and kNN voting is noise) and
    * complements [[knnSilhouette]]'s geometric view with the
    * supervised one. Exact integer counts off the memoized N·k edge
    * list + two label joins, one labels-sized aggregate, one 4dp
    * division.
    */
  def knnLabelPurity(s: SparkSession, dir: String): DataFrame = {
    val labels = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"))
    knnGraph(s, dir)
      .join(labels.select(col("vec_id").as("qid"), col("label").as("ql")),
        "qid")
      .join(labels.select(col("vec_id").as("nn_id"),
        col("label").as("nl")), "nn_id")
      .groupBy(col("ql").as("label"))
      .agg(count(lit(1)).as("n_edges"),
        sum(when(col("nl") === col("ql"), 1L).otherwise(0L))
          .as("n_same"))
      .select(col("label"), col("n_edges"), col("n_same"),
        round(col("n_same").cast("double") / col("n_edges"), 4)
          .as("purity"))
      .orderBy("label")
  }

  /** LOCAL OUTLIER FACTOR (Breunig et al., SIGMOD'00) over the kNN
    * graph — the DENSITY-RATIO outlier score [[embedOutliers]]'s
    * per-cell z-test can't express: a point is anomalous not because
    * it is far from everything but because it is SPARSER than its
    * own neighborhood (LOF ≈ 1 inlier, ≫ 1 outlier). All three
    * stages close over integers so no float aggregate depends on
    * fold order: distances are micro-quantized off the graph's
    * 4dp-rounded cosines, k-distance is an integer max, reachability
    * sums are integer, and the neighbor lrd ratios quantize to ppm
    * via IntegralDivide before the final per-node sum. Plan: the
    * memoized N·k edge list feeds three k-bounded joins/aggregates —
    * never a second corpus scan; zero-reach-sum neighbors (exact-
    * duplicate pileups) are guarded out of the ratio join.
    */
  def lofReport(s: SparkSession, dir: String): DataFrame = {
    val g = knnGraph(s, dir).select(col("qid"), col("nn_id").as("id"),
        expr("CAST(round((1 - score) * 1000000) AS BIGINT)").as("dm"))
      .localCheckpoint(true) // kdist, reach, and ratio legs
    val kd = g.groupBy(col("qid").as("id")).agg(max("dm").as("kdist"))
    val sr = g.join(kd, "id")
      .select(col("qid"), greatest(col("kdist"), col("dm")).as("reach"))
      .groupBy("qid").agg(sum("reach").as("sum_reach"))
      .localCheckpoint(true) // both sides of the ratio join
    val rat = g
      .join(sr.select(col("qid"), col("sum_reach").as("sa")), "qid")
      .join(sr.select(col("qid").as("id"), col("sum_reach").as("sb")),
        "id")
      .where(col("sb") > 0)
      .select(col("qid"), expr("(sa * 1000000) div sb").as("r"))
    // Final 4dp rounding in EXACT integer arithmetic (r13, fuzz seed
    // 505): lof = sr6/(kk·10⁶) can land on a decimal .XXXX5 boundary
    // (seed 505 planted 5060250/5000000 = 1.012050 exactly), where
    // Spark's round (shortest-decimal HALF_UP → 1.0121) and DuckDB's
    // (binary-double half-away → 1.0120) disagree. floor((2N·10⁴ +
    // D) / 2D) is the mathematically exact half-up of N/D at 4dp —
    // all-integer, bit-identical on both engines, and the true
    // decimal answer rather than either engine's double artifact.
    rat.groupBy("qid")
      .agg(count(lit(1)).as("kk"), sum("r").as("sr6"))
      .select(col("qid").as("vec_id"),
        (expr("(sr6 * 20000 + kk * 1000000) div (kk * 2000000)")
          .cast("double") / 10000.0).as("lof"))
      .orderBy("vec_id")
  }

  /** HUBNESS (k-occurrence) AUDIT — the distribution of DIRECTED
    * kNN in-degrees (Radovanović et al., JMLR'10: in high dimensions
    * a few points become "hubs" appearing in unexpectedly many kNN
    * lists while antihubs vanish from all of them — a known quality
    * risk for kNN classification, dedup blocking, and graph-based
    * ANN entry points). Emits the full in-degree histogram INCLUDING
    * the antihub zero bucket (nodes never retrieved — only visible by
    * left-joining the vertex set, the ivfRecallCurve zero-anchor
    * lesson). Out-degree is k by construction, so the histogram is
    * pure in-degree signal. Scale: edge list is N·k (memoized
    * [[knnGraph]]); in-degree is one keyed count with map-side
    * combine, the histogram a second count over N rows, output
    * ≤ max-indeg rows.
    */
  def knnHubness(s: SparkSession, dir: String): DataFrame = {
    val indeg = knnGraph(s, dir)
      .groupBy(col("nn_id").as("id")).agg(count(lit(1)).as("indeg"))
    Tables.embeddings(s, dir).select(col("vec_id").as("id"))
      .join(indeg, Seq("id"), "left")
      .select(coalesce(col("indeg"), lit(0L)).as("indeg"))
      .groupBy("indeg").agg(count(lit(1)).as("n_points"))
      .orderBy("indeg")
  }

  /** HITS hubs & authorities (Kleinberg '99) over the DIRECTED kNN
    * graph — the asymmetry PageRank's single score hides: a hub's
    * out-edges reach many well-cited points (broad coverage), an
    * authority's in-edges arrive from many hubs (the k-occurrence /
    * hubness signal from the other side). Two full mutual-recursion
    * rounds with INTEGER state (h₀ = 1 ⇒ a₁ = in-degree;
    * h₁ = Σ_out a₁; a₂ = Σ_in h₁; h₂ = Σ_out a₂) — the
    * graphCentrality discipline: no per-round float normalization to
    * be fold-order-dependent, one max-division at the end. Magnitudes
    * are bounded by (k·N)² ≈ 25N², so sums ride DECIMAL(38,0) (the
    * headroom rule — BIGINT wraps past N ≈ 6·10⁸) and the final
    * decimal→double conversion is exact below 2⁵³ and round-to-
    * nearest-even on both engines above it. Scale: the edge list is
    * N·k rows; each half-round is one k-bounded equi-join + keyed
    * aggregate with map-side combine absorbing the hub-key skew that
    * defines the very signal being measured.
    */
  def graphHits(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val edges = knnGraph(s, dir).select(col("qid"), col("nn_id").as("id"))
      .localCheckpoint(true) // consumed by all four half-rounds
    val nodes = Tables.embeddings(s, dir).select(col("vec_id").as("id"))
    val a1 = edges.groupBy("id")
      .agg(count(lit(1)).cast(dec).as("a1"))
    // inner joins are lossless here: an out-neighbor has ≥1 in-edge
    // by construction, so a1 (and transitively a2) covers every key
    // the next half-round asks for
    val h1 = edges.join(a1, "id").groupBy("qid").agg(sum("a1").as("h1"))
    val a2 = edges.join(h1, "qid").groupBy("id").agg(sum("h1").as("a2"))
    val h2 = edges.join(a2, "id").groupBy("qid").agg(sum("a2").as("h2"))
    val mx = a2.agg(max("a2").as("ma"))
      .crossJoin(h2.agg(max("h2").as("mh")))
    nodes.join(a2, Seq("id"), "left")
      .join(h2.withColumnRenamed("qid", "id"), Seq("id"), "left")
      .crossJoin(broadcast(mx))
      .select(col("id").as("vec_id"),
        round(coalesce(col("a2"), lit(0L).cast(dec)).cast("double")
          / col("ma").cast("double"), 6).as("authority"),
        round(coalesce(col("h2"), lit(0L).cast(dec)).cast("double")
          / col("mh").cast("double"), 6).as("hub"))
      .orderBy("vec_id")
  }

  // ------------------------------------------ persisted kNN graph

  /** Nodes of a persisted IVF index — the graph's vertex set IS the
    * index (one source of truth for vectors and cell layout).
    */
  private def graphNodes(s: SparkSession, indexPath: String): DataFrame =
    s.read.parquet(indexPath)
      .select(col("id"), col("vec"), col("cell").cast("long").as("cell"))

  /** kNN edges for `nodes` against the CURRENT index: probe cells
    * from the stored centroids (partition-pruned member read), exact
    * cosine, per-node top-k heap — [[knnGraph]]'s plan over the
    * persisted layout.
    */
  private def graphEdgesFor(s: SparkSession, indexPath: String,
                            nodes: DataFrame, k: Int,
                            nprobe: Int): DataFrame = {
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(indexPath)).select(col("cell"), col("cvec")))
    val probes = nodes.select(col("id").as("qid"), col("vec").as("qvec"),
        explode(centroidTopM(col("vec"), cents, nprobe)).as("p"))
      .select(col("qid"), col("qvec"), col("p.cell").as("cell"))
    val scored = graphNodes(s, indexPath).join(probes, "cell")
      .where(col("id") =!= col("qid"))
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(scored, k)
  }

  /** Persist the kNN graph of an IVF index, PARTITIONED BY EACH
    * NODE'S OWN CELL — the layout that makes maintenance churn-LOCAL:
    * a node's edges change only when a cell it probes is touched, and
    * the nodes probing a cell are (by construction of the probe
    * ranking) concentrated in that cell and its neighbors, so the
    * affected rows cluster in few partitions. A qid-hash layout would
    * scatter any affected set across every partition.
    */
  def knnGraphBuild(s: SparkSession, indexPath: String, graphPath: String,
                    k: Int = 5, nprobe: Int = 2): Unit = {
    val nodes = graphNodes(s, indexPath)
    writeCellPartitioned(graphEdgesFor(s, indexPath, nodes, k, nprobe)
      .join(nodes.select(col("id").as("qid"), col("cell")), "qid"), graphPath)
  }

  def knnGraphRead(s: SparkSession, graphPath: String): DataFrame =
    s.read.parquet(graphPath).select("qid", "rk", "nn_id", "score")

  /** INCREMENTAL GRAPH MAINTENANCE under vector upserts — provably
    * equal to a full rebuild. A node's candidate set is exactly the
    * membership of its (centroid-fixed, hence immutable) probe
    * cells, so an upsert batch can change a node's edge list only if
    * (a) the node itself was upserted, or (b) one of its probe cells
    * is TOUCHED — gained or lost a member (the moved id's old and
    * new cells). The affected set is therefore {upserted ids} ∪
    * {nodes probing a touched cell}; every other node's candidates —
    * and so its top-k — are untouched. Recompute edges for the
    * affected nodes only (partition-pruned member reads), then
    * dynamic-partition-overwrite only the partitions holding an
    * affected node's rows (new cell + old cell of moved nodes),
    * carrying unaffected co-partitioned rows; partitions the
    * replacement emptied are deleted (the publishTouchedCells
    * discipline). Work scales with churn locality (touched cells ×
    * their probers), never with graph size.
    *
    * CRASH WINDOW, CLOSED BY AN INTENT MARKER: the index upsert and
    * the graph publish are separate steps, and a crash between them
    * leaves the graph stale against the updated index — re-running
    * the same batch would NOT repair it by itself, because the moved
    * ids' old cells are no longer observable from the index, so
    * their probers would be missed. The pre-upsert `oldCells` are
    * therefore recorded DURABLY (graphPath + "_intent") before the
    * index is touched and deleted only after the graph publish
    * completes. A surviving marker means a prior attempt died inside
    * the window: its recorded cells are merged into this run's
    * touched set, restoring exactly the probe-cell visibility the
    * index lost — replay becomes a complete repair, and a marker
    * surviving a COMPLETED publish only adds already-clean cells to
    * the affected set (idempotent extra work). [[knnGraphBuild]]
    * remains a valid (if maximal) recovery, no longer the only one.
    */
  /** Read a surviving intent marker: (recorded cells, recorded ids).
    * The ids column is the r9-advice completion of the protocol:
    * cells alone cannot reconstruct a crashed batch's affected set —
    * a node the crashed run MOVED, whose new probe set misses its old
    * cell, would keep edges computed from its pre-upsert vector.
    * Markers written before the column existed read as cells-only.
    */
  private def readIntent(s: SparkSession,
                         fs: org.apache.hadoop.fs.FileSystem,
                         intentPath: org.apache.hadoop.fs.Path)
      : (Array[Long], Array[Long]) =
    if (fs.exists(new org.apache.hadoop.fs.Path(intentPath, "_SUCCESS"))) {
      val m = s.read.parquet(intentPath.toString)
      val cells = m.where(col("cell").isNotNull)
        .select("cell").collect().map(_.getLong(0))
      val ids =
        if (m.columns.contains("id"))
          m.where(col("id").isNotNull)
            .select("id").collect().map(_.getLong(0))
        else Array.empty[Long]
      (cells, ids)
    } else (Array.empty, Array.empty)

  /** Durably record a batch's pre-op cells AND member ids (one tiny
    * two-column file; either column may be empty). Replayed ids are
    * recomputed if still live and dropped if gone — so a marker from
    * EITHER a crashed upsert or a crashed delete repairs correctly
    * under whichever operation runs next.
    */
  private def writeIntent(s: SparkSession, intentPath: org.apache.hadoop.fs.Path,
                          cells: Array[Long], ids: Array[Long]): Unit = {
    import s.implicits._
    cells.toSeq.toDF("v")
      .select(col("v").as("cell"), lit(null).cast("long").as("id"))
      .unionByName(ids.toSeq.toDF("v")
        .select(lit(null).cast("long").as("cell"), col("v").as("id")))
      .coalesce(1).write.mode("overwrite").parquet(intentPath.toString)
  }

  def knnGraphUpsert(s: SparkSession, indexPath: String, graphPath: String,
                     updates: DataFrame, k: Int = 5,
                     nprobe: Int = 2): Unit = {
    import s.implicits._
    val intentPath = new org.apache.hadoop.fs.Path(graphPath + "_intent")
    val fs = intentPath.getFileSystem(s.sessionState.newHadoopConf())
    // a surviving marker = a prior run crashed after its index upsert
    // but before its graph publish; its cells are invisible in the
    // index now and its ids' edges are suspect — carry BOTH into this
    // run's repair scope
    val (pendingCells, pendingIds) = readIntent(s, fs, intentPath)
    val batchIds = updates.select("id").distinct().as[Long].collect()
    val allIds = (batchIds ++ pendingIds).distinct
    val ids = broadcast(allIds.toSeq.toDF("id"))
    val oldCells = (s.read.parquet(indexPath).join(ids, "id")
      .select(col("cell").cast("long").as("cell")).distinct()
      .collect().map(_.getLong(0)) ++ pendingCells).distinct
    // record intent BEFORE the index changes (torn marker without
    // _SUCCESS reads as absent — and then the index is still
    // untouched, so a plain re-run recomputes everything correctly)
    writeIntent(s, intentPath, oldCells, allIds)
    ivfIndexUpsert(s, indexPath, updates)
    val newCells = s.read.parquet(indexPath).join(ids, "id")
      .select(col("cell").cast("long").as("cell")).distinct()
      .collect().map(_.getLong(0))
    val touched = (oldCells ++ newCells).distinct
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(indexPath)).select(col("cell"), col("cvec")))
    val nodes = graphNodes(s, indexPath)
    // probe sets are a cheap per-row projection over literal
    // centroids — no shuffle; the isin filter keeps only probers of
    // touched cells
    val probers = nodes.select(col("id"),
        explode(centroidTopM(col("vec"), cents, nprobe)).as("p"))
      .where(col("p.cell").isin(touched.toIndexedSeq: _*))
      .select("id").distinct()
    val affectedIds = probers.unionByName(ids.select("id")).distinct()
      .localCheckpoint(true)
    val affected = nodes.join(broadcast(affectedIds), Seq("id"), "left_semi")
    val recomputed = graphEdgesFor(s, indexPath, affected, k, nprobe)
      .join(nodes.select(col("id").as("qid"), col("cell")), "qid")
      .select(col("qid"), col("rk"), col("nn_id"), col("score"),
        col("cell").cast("long").as("cell"))
    // partitions to rewrite: cells now holding an affected node +
    // old cells of moved nodes (whose stale rows must drop)
    val affCells = (affected.select(col("cell")).distinct()
      .collect().map(_.getLong(0)) ++ oldCells).distinct
    val keep = s.read.parquet(graphPath)
      .where(col("cell").isin(affCells.toIndexedSeq: _*))
      .join(broadcast(affectedIds.select(col("id").as("qid"))),
        Seq("qid"), "left_anti")
      .select(col("qid"), col("rk"), col("nn_id"), col("score"),
        col("cell").cast("long").as("cell"))
    // same self-overwrite discipline as publishTouchedCells: the
    // replacement reads files the dynamic overwrite deletes
    val replacement = keep.unionByName(recomputed).localCheckpoint(true)
    // writer-scoped overwrite mode (the AggTable r10-advice fix):
    // a session-global flip races with concurrent writers
    replacement.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(graphPath)
    // a cell every node moved out of would keep stale rows: dynamic
    // overwrite only replaces partitions present in the written data
    val written = replacement.select("cell").distinct().collect()
      .map(_.getLong(0)).toSet
    affCells.filterNot(written).foreach { c =>
      val dir = new org.apache.hadoop.fs.Path(graphPath, s"cell=$c")
      fs.delete(dir, true)
    }
    // publish complete — retire the marker (crash before this line
    // re-runs the repair with the recorded cells, idempotently)
    fs.delete(intentPath, true)
  }

  /** DELETE ids from index AND graph — [[knnGraphUpsert]]'s twin for
    * tombstones, with the same intent-marker crash protocol: the
    * deleted ids' cells are recorded durably before
    * [[ivfIndexDelete]] runs (afterwards they are unobservable from
    * the index), the cells' remaining probers get their edges
    * recomputed (a lost neighbor must be replaced from the cell's
    * survivors), and the deleted nodes' own rows drop. Work scales
    * with touched cells × their probers — churn locality, never
    * graph size.
    */
  def knnGraphDelete(s: SparkSession, indexPath: String, graphPath: String,
                     ids: DataFrame, k: Int = 5,
                     nprobe: Int = 2): Unit = {
    import s.implicits._
    val delIds = broadcast(ids.select("id").distinct())
    val intentPath = new org.apache.hadoop.fs.Path(graphPath + "_intent")
    val fs = intentPath.getFileSystem(s.sessionState.newHadoopConf())
    val (pendingCells, pendingIds) = readIntent(s, fs, intentPath)
    val batchIds = ids.select("id").distinct().as[Long].collect()
    val allIds = (batchIds ++ pendingIds).distinct
    val allIdsDf = broadcast(allIds.toSeq.toDF("id"))
    val oldCells = (s.read.parquet(indexPath).join(allIdsDf, "id")
      .select(col("cell").cast("long").as("cell")).distinct()
      .collect().map(_.getLong(0)) ++ pendingCells).distinct
    if (oldCells.isEmpty) return
    writeIntent(s, intentPath, oldCells, allIds)
    // the index delete applies ONLY to this batch's ids — marker ids
    // from a crashed UPSERT are live nodes to re-resolve, not deletes
    ivfIndexDelete(s, indexPath, delIds)
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(indexPath)).select(col("cell"), col("cvec")))
    val nodes = graphNodes(s, indexPath)
    val probers = nodes.select(col("id"),
        explode(centroidTopM(col("vec"), cents, nprobe)).as("p"))
      .where(col("p.cell").isin(oldCells.toIndexedSeq: _*))
      .select("id").distinct()
    // suspect set = probers of touched cells ∪ every batch/marker id:
    // live members recompute, dead members' rows drop (the anti-join)
    val gone = probers.unionByName(allIdsDf.select("id"))
      .distinct().localCheckpoint(true)
    val affected = nodes.join(broadcast(gone), Seq("id"), "left_semi")
    val recomputed = graphEdgesFor(s, indexPath, affected, k, nprobe)
      .join(nodes.select(col("id").as("qid"), col("cell")), "qid")
      .select(col("qid"), col("rk"), col("nn_id"), col("score"),
        col("cell").cast("long").as("cell"))
    val affCells = (affected.select(col("cell")).distinct()
      .collect().map(_.getLong(0)) ++ oldCells).distinct
    val keep = s.read.parquet(graphPath)
      .where(col("cell").isin(affCells.toIndexedSeq: _*))
      .join(broadcast(gone.select(col("id").as("qid"))),
        Seq("qid"), "left_anti")
      .select(col("qid"), col("rk"), col("nn_id"), col("score"),
        col("cell").cast("long").as("cell"))
    val replacement = keep.unionByName(recomputed).localCheckpoint(true)
    // writer-scoped overwrite mode (the AggTable r10-advice fix):
    // a session-global flip races with concurrent writers
    replacement.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(graphPath)
    val written = replacement.select("cell").distinct().collect()
      .map(_.getLong(0)).toSet
    affCells.filterNot(written).foreach { c =>
      val dir = new org.apache.hadoop.fs.Path(graphPath, s"cell=$c")
      fs.delete(dir, true)
    }
    fs.delete(intentPath, true)
  }

  /** GRAPH-BASED ANN (NSW beam search) — the closest relational
    * analog of the reference's hnswlib search loop
    * (hnswlib_index.cc:46 searchKnn): greedy best-first expansion
    * over a neighbor graph. The pointer-chasing loop becomes a
    * FIXED-ROUND BEAM ITERATION (a bounded-depth Pregel shape): the
    * graph is the symmetrized [[knnGraph]] edge table; each round
    * expands the per-query frontier by one hop (equi-join on src),
    * unions the frontier, and keeps the `beam` best by exact cosine;
    * after `rounds` hops the top-k of the final beam is the answer.
    * State per round is Q×beam rows — query-sized, never
    * corpus-sized — and each hop is one shuffle on the graph's edge
    * key, so depth (not corpus size) bounds the job chain. Entry
    * points come from a COARSE-TO-FINE DESCENT through the cached
    * IVF centroids (hnswlib's upper layers, hnswlib_index.cc:21-24,
    * serve exactly this role: route to a good neighborhood before
    * the fine-grained walk), so search needs no RNG and replays
    * bit-identically.
    */
  /** Shared beam traversal: returns (final frontier, visited set),
    * both per-query-scored frames. See [[nswSearch]] for the
    * iteration contract.
    */
  /** Beam ENTRY SET: per query, the members of its `nprobe` nearest
    * IVF cells under the cached centroids. Per-query entry work is
    * ≈ nprobe·stride rows — bounded by CELL SIZE, not corpus size
    * (cell count grows with the corpus; cell size stays ~stride) —
    * the scale contract AnnSpec pins.
    */
  private[graft] def nswEntry(s: SparkSession, dir: String,
                              queries: DataFrame,
                              nprobe: Int = 2): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    val assigned = assignTo(e, cents).select(col("id"), col("cell"))
    queries.select(col("qid"),
        explode(centroidTopM(col("qvec"), cents, nprobe)).as("p"))
      .select(col("qid"), col("p.cell").as("cell"))
      .join(assigned, "cell")
      .select("qid", "id")
  }

  /** Observability hook for the adaptive base-beam loop: the spec
    * pins that an easy query set stops before the round cap.
    */
  private[graft] final class DescentStats { @volatile var roundsRun: Int = 0 }

  /** BASE-BEAM LOOP with ADAPTIVE TERMINATION — the relational form
    * of hnswlib's ef-queue stop (hnswlib_index.cc:46 `searchKnn`
    * iterates while the candidate queue can still improve the result
    * set). Exact variant: `expand` is a pure function of the frontier
    * and scores are deterministic, so a round whose cut beam equals
    * the previous round's is a FIXPOINT — every remaining round would
    * recompute the identical (frontier, visited) bit-for-bit, and
    * skipping them changes nothing. That exactness is why the
    * unrolled SQL oracle needs no round-count column: the adaptive
    * run and the fixed-`rounds` run agree by construction. The
    * convergence probe costs two tiny jobs over the Q×beam
    * checkpointed frontier and only runs while more rounds remain —
    * a converged query set stops paying beam·graphK expansions it
    * cannot use (the r10 verdict's "most-likely user hit").
    */
  private def baseBeamLoop(frontier0: DataFrame, visited0: DataFrame,
                           edges: DataFrame,
                           scoreIds: DataFrame => DataFrame,
                           topBeam: (DataFrame, Int) => DataFrame,
                           beam: Int, rounds: Int,
                           stats: DescentStats): (DataFrame, DataFrame) = {
    var frontier = frontier0
    var visited = visited0
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val expand = frontier.join(edges, col("id") === col("src"))
        .select(col("qid"), col("dst").as("id"))
        .union(frontier.select("qid", "id"))
        .distinct()
      visited = visited.union(expand).distinct()
      val next = topBeam(scoreIds(expand), beam).localCheckpoint(true)
      r += 1
      // ONE action, not three (r16): multiset equality via the empty
      // symmetric difference — algebraically identical to the old
      // count()==count() && exceptAll.isEmpty (equal counts plus
      // one-sided inclusion ⟺ equal multisets ⟺ both exceptAlls
      // empty), but it costs a single tiny job on the two
      // checkpointed ≤Q×beam-row frames where the old form ran up to
      // three driver actions per round across the whole nsw/hnsw
      // family.
      if (r < rounds)
        converged = next.select("qid", "id")
          .exceptAll(frontier.select("qid", "id"))
          .union(frontier.select("qid", "id")
            .exceptAll(next.select("qid", "id")))
          .isEmpty
      frontier = next
    }
    if (stats != null) stats.roundsRun = r
    (frontier, visited)
  }

  private[graft] def nswTraverse(s: SparkSession, dir: String,
                          queries: DataFrame,
                          beam: Int, rounds: Int,
                          graphK: Int,
                          stats: DescentStats = null): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val g = knnGraph(s, dir, graphK)
      .select(col("qid").as("src"), col("nn_id").as("dst"))
    val edges = graft.ByproductCache.getOrCompute(
      s.sparkContext.applicationId, s"nswedges|$dir|$graphK") {
      g.union(g.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(true)
    }
    val q = queries.select(col("qid"), col("qvec"))
    def scoreIds(ids: DataFrame): DataFrame =
      ids.join(e, "id").join(broadcast(q), "qid")
        .select(col("qid"), col("id"),
          VectorDistance.cosine(col("vec"), col("qvec")).as("s"))
        .where(col("s").isNotNull)
    val byQ = Window.partitionBy("qid").orderBy(col("s").desc, col("id"))
    def topBeam(scored: DataFrame, n: Int): DataFrame =
      scored.withColumn("rk", row_number().over(byQ))
        .where(col("rk") <= n).select("qid", "id", "s")
    // COARSE LAYER: the stride-skeleton crossJoin this replaces
    // scored Q×(N/200) seeds in round 0 — linear in corpus size. The
    // descent instead routes each query through the SAME cached
    // centroids ann_ivf trains (a broadcast codegen projection, the
    // identical cost the blessed IVF probe pays) and seeds the beam
    // with the MEMBERS of its 2 nearest cells: per-query entry work
    // ≈ nprobe·stride rows, independent of corpus size — cell COUNT
    // grows with the corpus, cell SIZE stays ~stride.
    val entry = nswEntry(s, dir, q)
    val frontier0 = topBeam(scoreIds(entry), beam).localCheckpoint(true)
    val (frontier, visited) = baseBeamLoop(frontier0,
      frontier0.select("qid", "id"), edges, scoreIds, topBeam,
      beam, rounds, stats)
    (frontier, scoreIds(visited.distinct()))
  }

  def nswSearch(s: SparkSession, dir: String, queries: DataFrame,
                k: Int = 10, beam: Int = 16, rounds: Int = 3,
                graphK: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy("qid").orderBy(col("s").desc, col("id"))
    val (frontier, _) = nswTraverse(s, dir, queries, beam, rounds, graphK)
    frontier.withColumn("rk", row_number().over(byQ))
      .where(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id").as("nn_id"),
        round(col("s"), 4).as("score"))
      .orderBy("qid", "rk")
  }

  /** PER-REQUEST SEARCH EFFORT — the reference API's `ef_search`
    * parameter as REQUEST DATA (hnswlib_index.h:16 `search_vectors
    * (..., int ef_search = 50)`, applied via `setEf` at
    * hnswlib_index.cc:30): each request carries its own `ef`, and the
    * beam loop derives a per-request ROUND BUDGET from it —
    * rounds_q = min(maxRounds, max(1, ⌈ef / beam⌉)) — since each
    * round evaluates at most `beam` fresh frontier members, ef/beam
    * rounds is exactly "expand until ~ef candidates were considered",
    * hnswlib's ef-queue semantic in fixed-point relational form. A
    * query whose budget is spent FREEZES: its frontier is carried
    * untouched through later rounds (the identity step), so a batch
    * of mixed-effort requests runs as ONE loop at the max budget with
    * per-query gating joins against the request-sized budget table —
    * never a separate job per effort class. Monotone by construction:
    * per-query trajectories are qid-partitioned and deterministic, so
    * a smaller ef's visited set is a strict PREFIX (round-wise) of a
    * larger ef's — a smaller ef can never expand more nodes (AnnSpec
    * pins this).
    *
    * @param reqs (qid, qvec, ef) — ef per request
    * @return (qid, rk, nn_id, score, rounds_used) — rounds_used is
    *         the budget the request ran, emitted as DATA so the
    *         oracle mirrors it from the same ⌈ef/beam⌉ expression
    */
  private[graft] def nswTraverseEf(s: SparkSession, dir: String,
                                   reqs: DataFrame, beam: Int,
                                   maxRounds: Int, graphK: Int)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val g = knnGraph(s, dir, graphK)
      .select(col("qid").as("src"), col("nn_id").as("dst"))
    val edges = graft.ByproductCache.getOrCompute(
      s.sparkContext.applicationId, s"nswedges|$dir|$graphK") {
      g.union(g.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(true)
    }
    val q = reqs.select(col("qid"), col("qvec"))
    val budgets = reqs.select(col("qid"),
        least(lit(maxRounds), greatest(lit(1),
          ceil(col("ef").cast("double") / lit(beam)).cast("int"))).as("rq"))
      .localCheckpoint(true)
    def scoreIds(ids: DataFrame): DataFrame =
      ids.join(e, "id").join(broadcast(q), "qid")
        .select(col("qid"), col("id"),
          VectorDistance.cosine(col("vec"), col("qvec")).as("s"))
        .where(col("s").isNotNull)
    val byQ = Window.partitionBy("qid").orderBy(col("s").desc, col("id"))
    def topBeam(scored: DataFrame): DataFrame =
      scored.withColumn("rk", row_number().over(byQ))
        .where(col("rk") <= beam).select("qid", "id", "s")
    val entry = nswEntry(s, dir, q)
    var frontier = topBeam(scoreIds(entry)).localCheckpoint(true)
    var visited = frontier.select("qid", "id")
    for (r <- 1 to maxRounds) {
      // gate on the request-sized budget table: spent queries take
      // the identity step, active ones expand one hop
      val act = frontier.join(
        broadcast(budgets.where(col("rq") >= r).select("qid")), "qid")
      val frozen = frontier.join(
        broadcast(budgets.where(col("rq") < r).select("qid")), "qid")
      val expand = act.join(edges, col("id") === col("src"))
        .select(col("qid"), col("dst").as("id"))
        .union(act.select("qid", "id"))
        .distinct()
      visited = visited.union(expand).distinct()
      frontier = topBeam(scoreIds(expand)).unionByName(frozen)
        .localCheckpoint(true)
    }
    (frontier.join(broadcast(budgets), "qid"), visited)
  }

  def nswSearchEf(s: SparkSession, dir: String, reqs: DataFrame,
                  k: Int = 10, beam: Int = 16, maxRounds: Int = 3,
                  graphK: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy("qid").orderBy(col("s").desc, col("id"))
    val (frontier, _) = nswTraverseEf(s, dir, reqs, beam, maxRounds, graphK)
    frontier.withColumn("rk", row_number().over(byQ))
      .where(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id").as("nn_id"),
        round(col("s"), 4).as("score"),
        col("rq").cast("long").as("rounds_used"))
      .orderBy("qid", "rk")
  }

  /** FILTERED graph search — the reference's HNSW path takes the
    * scalar-filter bitmap as a SELECTOR (hnswlib_index.cc:28-37,
    * searchKnn with IdSelector): traversal runs on the full graph,
    * the filter gates only what may be RETURNED. The relational
    * analog: beam-traverse unfiltered, then rank the
    * filter-passing members of the VISITED SET (every id any round
    * scored — Q×(beam·graphK·rounds)-bounded, query-sized). Like
    * the reference, a highly selective filter can return fewer than
    * k rows — the documented approximate-filtered contract (the
    * exact path vdb_knn_filtered_* guarantees k).
    */
  def nswSearchFiltered(s: SparkSession, dir: String, queries: DataFrame,
                        filter: org.apache.spark.sql.Column, k: Int = 5,
                        beam: Int = 16, rounds: Int = 3,
                        graphK: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy("qid").orderBy(col("s").desc, col("id"))
    val (_, visitedScored) = nswTraverse(s, dir, queries, beam, rounds, graphK)
    val allowed = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("label")).where(filter)
    // semi-join, no forced broadcast: the visited side is
    // query-sized but `allowed` is corpus-sized (label-filtered) —
    // AQE picks the build side
    visitedScored
      .join(allowed.select("id"), Seq("id"), "left_semi")
      .withColumn("rk", row_number().over(byQ))
      .where(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id").as("nn_id"),
        round(col("s"), 4).as("score"))
      .orderBy("qid", "rk")
  }

  def nswQuery(s: SparkSession, dir: String): DataFrame =
    nswSearch(s, dir, Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec")))

  def nswFilteredQuery(s: SparkSession, dir: String): DataFrame =
    nswSearchFiltered(s, dir,
      Tables.embeddings(s, dir).where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      col("label") === 5)

  // ------------------------------------------------ hierarchical NSW

  /** TRUE LAYER HIERARCHY — the missing piece of the hnswlib analog.
    * [[nswSearch]] compensates for hnswlib's upper layers with an
    * IVF-centroid descent; this family builds the layers themselves
    * (reference hnswlib_index.cc:21-24, `HierarchicalNSW` — every
    * node draws a geometric level and appears in all layers up to
    * it; search enters at the single top node and descends).
    *
    * Level rule: node id is in layer `l` iff its md5-derived hash is
    * ≡ 0 (mod 8^l) — the deterministic analog of hnswlib's
    * `-ln(U)·mL` geometric draw (P[level ≥ l] = 8^-l), md5-keyed so
    * membership cannot alias against id-modulo predicates or the
    * stride-sampled centroids. Levels are NESTED (layer l+1 ⊆ layer
    * l), capped at 4: at 8^4 = 4096× coarsening the top layer of any
    * testable corpus is a handful of nodes, and extra depth only
    * adds empty no-op layers (an empty layer's expand is the
    * identity carry — both sides mirror that).
    */
  private[graft] def hnswLevel(idCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val h = conv(substring(md5(idCol.cast("string")), 1, 15), 16, 10)
      .cast("long")
    when(h % 4096 === 0, 4).when(h % 512 === 0, 3)
      .when(h % 64 === 0, 2).when(h % 8 === 0, 1).otherwise(0)
  }

  /** kNN edges AMONG the members of one layer, blocked by the same
    * cached IVF cells the other ANN paths train. The probe width is
    * DENSITY-COMPENSATED: layer `l` keeps 1-in-8^l of the corpus, so
    * probing `2·8^l` nearest cells keeps the per-node candidate count
    * ≈ 2·stride at EVERY layer and every corpus size — upper layers
    * stay as connected at 100 TB as at sf0.01, and per-node build
    * cost is constant per layer while layer sizes shrink 8×, so the
    * whole hierarchy builds for ≈ N/7 extra edge computations on top
    * of the base graph. Symmetrized like the base [[knnGraph]] edges.
    */
  private[graft] def hnswLayerEdges(s: SparkSession, dir: String, layer: Int,
                                    k: Int = 8): DataFrame =
    graft.ByproductCache.getOrCompute(s.sparkContext.applicationId,
      s"hnswedges|$dir|$layer|$k") {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val cents = centCache.computeIfAbsent((dir, 200L),
        _ => collectCentroids(kmeansCentroids(e, 200)))
      val nprobeL = math.min(2 * math.pow(8, layer).toInt, cents.length)
      val nodes = e.where(hnswLevel(col("id")) >= layer)
      val probes = nodes.select(col("id").as("qid"), col("vec").as("qv"),
          explode(centroidTopM(col("vec"), cents, nprobeL)).as("p"))
        .select(col("qid"), col("qv"), col("p.cell").as("cell"))
      val members = assignTo(e, cents)
        .where(hnswLevel(col("id")) >= layer)
        .select(col("cell"), col("id"), col("vec"))
      val scored = probes.join(members, "cell")
        .where(col("id") =!= col("qid"))
        .select(col("qid"), col("id"),
          VectorDistance.cosine(col("vec"), col("qv")).as("s"))
        .where(col("s").isNotNull)
      val byQ = Window.partitionBy("qid").orderBy(col("s").desc, col("id"))
      val g = scored.withColumn("rk", row_number().over(byQ))
        .where(col("rk") <= k).select(col("qid").as("src"), col("id").as("dst"))
      val sym = g.union(g.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(true)
      // an empty layer memoizes as a LocalRelation: the traversal's
      // per-query emptiness probe then resolves on the driver with no
      // job at all (the sparsest top layers are empty at every small
      // SF, and the probe used to cost a task per layer per query)
      if (sym.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          sym.schema)
      else sym
    }

  /** Coarse-to-fine descent + base beam: enter at THE single highest
    * node (max level, then min id — hnswlib's enterpoint), walk one
    * expand-score-cut round per upper layer (4→1, beam 8), then run
    * the [[nswSearch]] base loop (3 rounds, beam 16) seeded with the
    * layer-1 frontier. Round-0 work is Q×1 — entry cost is CONSTANT
    * in corpus size, the contract the r8 verdict asked the NSW family
    * to meet; the upper-layer rounds are each ≤ Q×beam×k edge
    * expansions. Returns (final frontier, scored visited set).
    */
  /** Traversal core shared by the in-memory and persisted-index
    * variants: same descent, edges supplied by the caller.
    */
  private def hnswTraverseEdges(e: DataFrame, queries: DataFrame,
                                layerEdges: Int => DataFrame,
                                edges0: DataFrame,
                                beamU: Int, beam: Int,
                                rounds: Int,
                                stats: DescentStats = null,
                                entMemoKey: Option[String] = None)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("qid"), col("qvec"))
    def scoreIds(ids: DataFrame): DataFrame =
      ids.join(e, "id").join(broadcast(q), "qid")
        .select(col("qid"), col("id"),
          VectorDistance.cosine(col("vec"), col("qvec")).as("s"))
        .where(col("s").isNotNull)
    val byQ = Window.partitionBy("qid").orderBy(col("s").desc, col("id"))
    def topBeam(scored: DataFrame, n: Int): DataFrame =
      scored.withColumn("rk", row_number().over(byQ))
        .where(col("rk") <= n).select("qid", "id", "s")
    // The enterpoint (max level, then min id — hnswlib's
    // enterpoint_node_) is a deterministic function of the node-id
    // SET, but finding it is a full pass over `e`; every descent used
    // to pay that pass inside its round-0 checkpoint. Callers whose
    // node set is immutable for the session (the in-memory variant:
    // Tables.embeddings of a fixed dir) pass a memo key so the pass
    // runs once per dir — index metadata, exactly what hnswlib keeps
    // in its index header. The persisted-index variant does NOT
    // memoize: maintenance (hnswUpsert/Delete) mutates its node set
    // mid-session and a stale enterpoint could change results.
    def entOf: DataFrame = e.select(col("id"), hnswLevel(col("id")).as("lvl"))
      .orderBy(col("lvl").desc, col("id").asc).limit(1).select("id")
    val ent = entMemoKey match {
      case Some(k) => graft.ByproductCache.getOrCompute(
        e.sparkSession.sparkContext.applicationId, k) {
        entOf.localCheckpoint(true)
      }
      case None => entOf
    }
    var frontier = topBeam(
      scoreIds(q.select("qid").crossJoin(broadcast(ent))), beamU)
      .localCheckpoint(true)
    var visited = frontier.select("qid", "id")
    for (l <- 4 to 1 by -1) {
      val edges = layerEdges(l)
      // an EMPTY layer's step is the identity: expand = frontier,
      // and rescoring + re-cutting an already-beamU-cut frontier
      // reproduces it bit-for-bit (deterministic scores), while
      // frontier ⊆ visited already holds — so skip the four jobs.
      // The sparsest top layers of a small corpus hit this on every
      // query; the SQL mirror's equivalent blocks reduce to the same
      // carry-through algebraically.
      if (!edges.isEmpty) {
        val expand = frontier.join(edges, col("id") === col("src"))
          .select(col("qid"), col("dst").as("id"))
          .union(frontier.select("qid", "id"))
          .distinct()
        visited = visited.union(expand).distinct()
        frontier = topBeam(scoreIds(expand), beamU).localCheckpoint(true)
      }
    }
    val (fr, vis) = baseBeamLoop(frontier, visited, edges0, scoreIds,
      topBeam, beam, rounds, stats)
    (fr, scoreIds(vis.distinct()))
  }

  private def hnswTraverse(s: SparkSession, dir: String, queries: DataFrame,
                           beamU: Int, beam: Int, rounds: Int,
                           graphK: Int): (DataFrame, DataFrame) = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val g = knnGraph(s, dir, graphK)
      .select(col("qid").as("src"), col("nn_id").as("dst"))
    val edges0 = graft.ByproductCache.getOrCompute(
      s.sparkContext.applicationId, s"nswedges|$dir|$graphK") {
      g.union(g.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(true)
    }
    hnswTraverseEdges(e, queries, l => hnswLayerEdges(s, dir, l, graphK),
      edges0, beamU, beam, rounds,
      entMemoKey = Some(s"hnswent|mem|$dir"))
  }

  def hnswSearch(s: SparkSession, dir: String, queries: DataFrame,
                 k: Int = 10, beamU: Int = 8, beam: Int = 16,
                 rounds: Int = 3, graphK: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy("qid").orderBy(col("s").desc, col("id"))
    val (frontier, _) =
      hnswTraverse(s, dir, queries, beamU, beam, rounds, graphK)
    frontier.withColumn("rk", row_number().over(byQ))
      .where(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id").as("nn_id"),
        round(col("s"), 4).as("score"))
      .orderBy("qid", "rk")
  }

  /** Filtered hierarchical search — same selector semantics as
    * [[nswSearchFiltered]] (hnswlib_index.cc:28-37: traverse the full
    * graph, gate only what may be returned): rank the filter-passing
    * members of the descent's visited set.
    */
  def hnswSearchFiltered(s: SparkSession, dir: String, queries: DataFrame,
                         filter: org.apache.spark.sql.Column, k: Int = 5,
                         beamU: Int = 8, beam: Int = 16, rounds: Int = 3,
                         graphK: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy("qid").orderBy(col("s").desc, col("id"))
    val (_, visitedScored) =
      hnswTraverse(s, dir, queries, beamU, beam, rounds, graphK)
    val allowed = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("label")).where(filter)
    visitedScored
      .join(allowed.select("id"), Seq("id"), "left_semi")
      .withColumn("rk", row_number().over(byQ))
      .where(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id").as("nn_id"),
        round(col("s"), 4).as("score"))
      .orderBy("qid", "rk")
  }

  def hnswQuery(s: SparkSession, dir: String): DataFrame =
    hnswSearch(s, dir, Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec")))

  def hnswFilteredQuery(s: SparkSession, dir: String): DataFrame =
    hnswSearchFiltered(s, dir,
      Tables.embeddings(s, dir).where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      col("label") === 5)

  // ---------------------------------------- persisted hierarchy

  /** Density-compensated probe width for a layer (see
    * [[hnswLayerEdges]]): 2·8^layer cells keeps per-node candidates
    * ≈ 2·stride at every layer. Layer 0 is the base graph's
    * nprobe=2.
    */
  private def hnswNprobe(layer: Int, ncells: Int): Int =
    math.min(2 * math.pow(8, layer).toInt, ncells)

  /** Layer-l kNN edges for `nodes` against the CURRENT persisted
    * index — [[graphEdgesFor]] generalized with the layer's member
    * restriction and probe width. Layer 0 degenerates to exactly
    * [[graphEdgesFor]]'s base edges.
    */
  private def graphEdgesLayer(s: SparkSession, indexPath: String,
                              nodes: DataFrame, layer: Int,
                              k: Int): DataFrame = {
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(indexPath)).select(col("cell"), col("cvec")))
    val np = hnswNprobe(layer, cents.length)
    val probes = nodes.select(col("id").as("qid"), col("vec").as("qvec"),
        explode(centroidTopM(col("vec"), cents, np)).as("p"))
      .select(col("qid"), col("qvec"), col("p.cell").as("cell"))
    val scored = graphNodes(s, indexPath)
      .where(hnswLevel(col("id")) >= layer)
      .join(probes, "cell")
      .where(col("id") =!= col("qid"))
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(scored, k)
  }

  /** PERSIST THE WHOLE HIERARCHY — layers 0..4 of an IVF index as
    * one parquet table PARTITIONED BY (layer, cell). Layer 0 (probe
    * width 2) IS the base kNN graph, so this table is the complete
    * search structure: a descent reads each layer partition-pruned,
    * and maintenance is churn-local exactly as [[knnGraphBuild]]'s
    * layout argument says — a touched cell's rows cluster in 5
    * partitions (one per layer), not across the table. Levels are a
    * pure function of id ([[hnswLevel]]), so an upsert can never
    * move a node between layers — only its cell and edges change.
    */
  def hnswBuild(s: SparkSession, indexPath: String, hnswPath: String,
                k: Int = 8): Unit = {
    val nodes = graphNodes(s, indexPath)
    val cellOf = nodes.select(col("id").as("qid"), col("cell"))
    val layers = (0 to 4).map { l =>
      graphEdgesLayer(s, indexPath,
          nodes.where(hnswLevel(col("id")) >= l), l, k)
        .join(cellOf, "qid")
        .select(lit(l).as("layer"), col("qid"), col("rk"), col("nn_id"),
          col("score"), col("cell").cast("long").as("cell"))
    }.reduce(_ unionByName _)
    layers.write.mode("overwrite")
      .partitionBy("layer", "cell").parquet(hnswPath)
  }

  def hnswRead(s: SparkSession, hnswPath: String): DataFrame =
    s.read.parquet(hnswPath)
      .select(col("layer").cast("int").as("layer"), col("qid"),
        col("rk"), col("nn_id"), col("score"))

  /** INCREMENTAL HIERARCHY MAINTENANCE — [[knnGraphUpsert]]'s
    * protocol applied to every layer under ONE intent marker: record
    * the batch's pre-upsert cells durably, upsert the index once,
    * then per layer recompute the affected nodes (the layer's
    * upserted members ∪ the layer nodes probing a touched cell at
    * that layer's width) and dynamic-overwrite only the (layer,
    * cell) partitions holding an affected row. Equal to a fresh
    * [[hnswBuild]] by the same argument as the base graph — a
    * layer-l node's candidate set is exactly the layer-l membership
    * of its probe cells, and level membership is immutable — with
    * the same crash-window repair (a surviving marker's cells AND
    * ids merge into the next run's repair scope, so a crashed
    * batch's moved nodes re-resolve even when their new probe sets
    * miss every recorded cell).
    */
  def hnswUpsert(s: SparkSession, indexPath: String, hnswPath: String,
                 updates: DataFrame, k: Int = 8): Unit = {
    import s.implicits._
    val intentPath = new org.apache.hadoop.fs.Path(hnswPath + "_intent")
    val fs = intentPath.getFileSystem(s.sessionState.newHadoopConf())
    // marker carries cells AND ids (readIntent scaladoc): a crashed
    // batch's node whose new probe set misses its old cell is only
    // reachable through the recorded ids
    val (pendingCells, pendingIds) = readIntent(s, fs, intentPath)
    val batchIds = updates.select("id").distinct().as[Long].collect()
    val allIds = (batchIds ++ pendingIds).distinct
    val ids = broadcast(allIds.toSeq.toDF("id"))
    val oldCells = (s.read.parquet(indexPath).join(ids, "id")
      .select(col("cell").cast("long").as("cell")).distinct()
      .collect().map(_.getLong(0)) ++ pendingCells).distinct
    writeIntent(s, intentPath, oldCells, allIds)
    ivfIndexUpsert(s, indexPath, updates)
    val newCells = s.read.parquet(indexPath).join(ids, "id")
      .select(col("cell").cast("long").as("cell")).distinct()
      .collect().map(_.getLong(0))
    val touched = (oldCells ++ newCells).distinct
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(indexPath)).select(col("cell"), col("cvec")))
    val nodes = graphNodes(s, indexPath)
    val perLayer = (0 to 4).map { l =>
      val lnodes = nodes.where(hnswLevel(col("id")) >= l)
      val np = hnswNprobe(l, cents.length)
      val probers = lnodes.select(col("id"),
          explode(centroidTopM(col("vec"), cents, np)).as("p"))
        .where(col("p.cell").isin(touched.toIndexedSeq: _*))
        .select("id").distinct()
      // every batch/marker id enters directly (NOT via an lnodes
      // semi-join): a dead marker id has no lnodes row but its stale
      // graph rows must still drop through the keep anti-join below
      val affectedIds = probers
        .unionByName(ids.select("id"))
        .distinct().localCheckpoint(true)
      val affected = lnodes.join(broadcast(affectedIds), Seq("id"), "left_semi")
      val recomputed = graphEdgesLayer(s, indexPath, affected, l, k)
        .join(nodes.select(col("id").as("qid"), col("cell")), "qid")
        .select(lit(l).as("layer"), col("qid"), col("rk"), col("nn_id"),
          col("score"), col("cell").cast("long").as("cell"))
      val affCells = (affected.select(col("cell")).distinct()
        .collect().map(_.getLong(0)) ++ oldCells).distinct
      val keep = s.read.parquet(hnswPath)
        .where(col("layer") === l &&
          col("cell").isin(affCells.toIndexedSeq: _*))
        .join(broadcast(affectedIds.select(col("id").as("qid"))),
          Seq("qid"), "left_anti")
        .select(lit(l).as("layer"), col("qid"), col("rk"), col("nn_id"),
          col("score"), col("cell").cast("long").as("cell"))
      (keep.unionByName(recomputed), affCells.map(c => (l, c)))
    }
    val replacement = perLayer.map(_._1).reduce(_ unionByName _)
      .localCheckpoint(true)
    val affPairs = perLayer.flatMap(_._2)
    publishHnsw(s, hnswPath, replacement, affPairs, fs)
    fs.delete(intentPath, true)
  }

  /** Tombstone twin ([[knnGraphDelete]] per layer, one marker). */
  def hnswDelete(s: SparkSession, indexPath: String, hnswPath: String,
                 ids: DataFrame, k: Int = 8): Unit = {
    import s.implicits._
    val delIds = broadcast(ids.select("id").distinct())
    val intentPath = new org.apache.hadoop.fs.Path(hnswPath + "_intent")
    val fs = intentPath.getFileSystem(s.sessionState.newHadoopConf())
    val (pendingCells, pendingIds) = readIntent(s, fs, intentPath)
    val batchIds = ids.select("id").distinct().as[Long].collect()
    val allIds = (batchIds ++ pendingIds).distinct
    val allIdsDf = broadcast(allIds.toSeq.toDF("id"))
    val oldCells = (s.read.parquet(indexPath).join(allIdsDf, "id")
      .select(col("cell").cast("long").as("cell")).distinct()
      .collect().map(_.getLong(0)) ++ pendingCells).distinct
    if (oldCells.isEmpty) return
    writeIntent(s, intentPath, oldCells, allIds)
    // index delete applies ONLY to this batch's ids (marker ids from
    // a crashed upsert are live nodes to re-resolve)
    ivfIndexDelete(s, indexPath, delIds)
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(indexPath)).select(col("cell"), col("cvec")))
    val nodes = graphNodes(s, indexPath)
    val perLayer = (0 to 4).map { l =>
      val lnodes = nodes.where(hnswLevel(col("id")) >= l)
      val np = hnswNprobe(l, cents.length)
      val probers = lnodes.select(col("id"),
          explode(centroidTopM(col("vec"), cents, np)).as("p"))
        .where(col("p.cell").isin(oldCells.toIndexedSeq: _*))
        .select("id").distinct()
      // suspect set = probers ∪ every batch/marker id: live members
      // recompute (lnodes semi), dead members' rows drop (anti below)
      val gone = probers.unionByName(allIdsDf.select("id"))
        .distinct().localCheckpoint(true)
      val affected = lnodes.join(broadcast(gone), Seq("id"), "left_semi")
      val recomputed = graphEdgesLayer(s, indexPath, affected, l, k)
        .join(nodes.select(col("id").as("qid"), col("cell")), "qid")
        .select(lit(l).as("layer"), col("qid"), col("rk"), col("nn_id"),
          col("score"), col("cell").cast("long").as("cell"))
      val affCells = (affected.select(col("cell")).distinct()
        .collect().map(_.getLong(0)) ++ oldCells).distinct
      val keep = s.read.parquet(hnswPath)
        .where(col("layer") === l &&
          col("cell").isin(affCells.toIndexedSeq: _*))
        .join(broadcast(gone.select(col("id").as("qid"))),
          Seq("qid"), "left_anti")
        .select(lit(l).as("layer"), col("qid"), col("rk"), col("nn_id"),
          col("score"), col("cell").cast("long").as("cell"))
      (keep.unionByName(recomputed), affCells.map(c => (l, c)))
    }
    val replacement = perLayer.map(_._1).reduce(_ unionByName _)
      .localCheckpoint(true)
    publishHnsw(s, hnswPath, replacement, perLayer.flatMap(_._2), fs)
    fs.delete(intentPath, true)
  }

  /** Dynamic-partition-overwrite publish + emptied-partition GC for
    * the (layer, cell) layout — the [[knnGraphUpsert]] publish
    * discipline lifted to two partition columns.
    */
  private def publishHnsw(s: SparkSession, hnswPath: String,
                          replacement: DataFrame,
                          affPairs: Seq[(Int, Long)],
                          fs: org.apache.hadoop.fs.FileSystem): Unit = {
    // writer-scoped overwrite mode (the AggTable r10-advice fix):
    // a session-global flip races with concurrent writers
    replacement.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("layer", "cell").parquet(hnswPath)
    val written = replacement.select("layer", "cell").distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    affPairs.distinct.filterNot(written).foreach { case (l, c) =>
      val dir = new org.apache.hadoop.fs.Path(hnswPath, s"layer=$l/cell=$c")
      fs.delete(dir, true)
    }
  }

  /** Search the PERSISTED hierarchy: same descent as [[hnswSearch]],
    * edges read partition-pruned from the (layer, cell) layout and
    * symmetrized on read. Equal to the in-memory path by
    * construction (same centroids, same layer membership, same edge
    * rule) — AnnSpec pins the equality, so the persisted structure
    * shares ann_hnsw's oracle.
    */
  def hnswSearchIndexed(s: SparkSession, indexPath: String, hnswPath: String,
                        queries: DataFrame, k: Int = 10, beamU: Int = 8,
                        beam: Int = 16, rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = graphNodes(s, indexPath).select(col("id"), col("vec"))
    val all = hnswRead(s, hnswPath)
    val root = new org.apache.hadoop.fs.Path(hnswPath)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    def sym(layer: Int): DataFrame =
      // an absent layer directory means the layer has no edges — an
      // empty LocalRelation lets the traversal skip the step with no
      // job at all (not even an isEmpty probe)
      if (!fs.exists(new org.apache.hadoop.fs.Path(root, s"layer=$layer")))
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("src",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("dst",
              org.apache.spark.sql.types.LongType))))
      else {
        val g = all.where(col("layer") === layer)
          .select(col("qid").as("src"), col("nn_id").as("dst"))
        g.union(g.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
      }
    // the base edges feed every beam round — materialize once
    // instead of re-scanning the layer-0 partitions per round
    val edges0 = sym(0).localCheckpoint(true)
    val (frontier, _) = hnswTraverseEdges(e, queries, sym, edges0,
      beamU, beam, rounds)
    val byQ = Window.partitionBy("qid").orderBy(col("s").desc, col("id"))
    frontier.withColumn("rk", row_number().over(byQ))
      .where(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id").as("nn_id"),
        round(col("s"), 4).as("score"))
      .orderBy("qid", "rk")
  }

  /** Persisted-hierarchy twin of [[hnswQuery]]: index + hierarchy
    * built once per sf dir under the IndexCache root, then searched
    * partition-pruned — shares [[hnswQuery]]'s oracle because both
    * paths train the same centroids and apply the same edge rule.
    */
  private[graft] def hnswIndexedPath(s: SparkSession, dir: String): String = {
    val idx = indexedPath(s, dir)
    val hp = graft.IndexCache.dirFor(dir, "hnsw")
      .toAbsolutePath.toString
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(hp, "_SUCCESS")))
      hnswBuild(s, idx, hp)
    hp
  }

  def hnswIndexedQuery(s: SparkSession, dir: String): DataFrame = {
    val idx = indexedPath(s, dir)
    val hp = hnswIndexedPath(s, dir)
    hnswSearchIndexed(s, idx, hp,
      Tables.embeddings(s, dir).where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")))
  }

  /** EMBEDDING-SPACE DUPLICATE CLUSTERS — connected components over
    * the mutual-kNN graph: the embedding analog of the minhash
    * dedup_clusters pipeline (pairs → components → keep one per
    * cluster). Mutual edges (not raw kNN) keep hub nodes from
    * chaining unrelated neighborhoods into one giant component —
    * the standard failure of single-link over asymmetric kNN.
    * Reuses [[graft.operators.Dedup.connectedComponents]]
    * (min-label propagation, per-round checkpoints, diameter-bounded).
    */
  def embedKnnClusters(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    graft.ByproductCache.getOrCompute(s.sparkContext.applicationId,
      s"embclusters|$dir|$k") {
      Dedup.connectedComponents(mutualKnnPairs(s, dir, k)
          .select(col("id_a").as("id1"), col("id_b").as("id2")))
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
    }.orderBy("vec_id")

  def lshQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    lshSearch(e, q, k = 10)
  }

  def lshMultiprobeQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    lshSearchMultiprobe(e, q, k = 10)
  }

  /** SEMANTIC CLUSTERING surfaced as a first-class operator — the
    * IVF quantizer's k-means doing corpus analysis instead of index
    * routing: per cluster, its population, the dominant metadata
    * label with its purity, and the mean cosine to the centroid (the
    * per-cluster cohesion the recluster policy watches). This is the
    * topic-composition dashboard a curation pipeline reads before
    * reweighting domains, and it shares the EXACT trained centroids
    * with the search path ([[centCache]]) so analysis and routing
    * cannot disagree.
    *
    * Plan: the zero-exchange assignment projection, a broadcast join
    * to the k-row centroid table for the cohesion cosine, then two
    * chained aggregates (cell,label → cell) — the q13 count-of-counts
    * shape, map-side combined on the first (heavy) key. Float policy:
    * each row's cosine is 4dp-quantized to INTEGER micro-units before
    * summing (sums stay exact/associative — the exact-aggregate
    * rule), so only the final mean divisions of two exact longs are
    * float, bit-identical on any IEEE engine.
    *
    * Dominant label via max_by over (count, −label): deterministic
    * argmax, ties to the smallest label.
    */
  def clusterStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("label").cast("long").as("label"),
        col("embedding").as("vec"))
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(
        e.select(col("id"), col("vec")), 200)))
    val centsDf = cents.toSeq.toDF("cell", "cvec")
    val base = assignTo(e, cents)
      .join(broadcast(centsDf), "cell")
      .select(col("cell"), col("label"),
        VectorDistance.cosine(col("vec"), col("cvec")).as("cos"))
      .withColumn("micro", expr("cast(round(cos * 10000) as bigint)"))
    val gl = base.groupBy("cell", "label")
      .agg(count(lit(1)).as("n"), sum("micro").as("sm"))
    gl.groupBy("cell")
      .agg(sum("n").as("size"), sum("sm").as("smm"),
        max_by(col("label"), struct(col("n"), -col("label")))
          .as("dom_label"),
        max(struct(col("n"), -col("label"))).getField("n").as("n_dom"))
      .select(col("cell"), col("size"), col("dom_label"),
        round(col("n_dom") * 1.0 / col("size"), 4).as("purity"),
        round(col("smm") * 1.0 / col("size") / 10000.0, 4).as("mean_cos"))
      .orderBy("cell")
  }

  /** CELL-LEVEL SILHOUETTE — the cluster-separation report grading
    * the IVF partition itself (clusterStats says how COHESIVE each
    * cell is; this says whether cells are SEPARATED enough for the
    * probe geometry to work): per cell, a = mean member→own-centroid
    * cosine distance, b = distance to the NEAREST other centroid,
    * s = (b−a)/max(a,b) — the simplified (centroid-based) silhouette
    * of Kaufman & Rousseeuw. s near 0 or negative flags cells the
    * quantizer should merge (their members sit as close to a
    * neighbor's centroid as their own — exactly where nprobe recall
    * leaks). Member distances fold as exact micro-unit integers
    * (order-free sums, the clusterStats discipline); b is a
    * deterministic min over the centroid×centroid grid — metadata-
    * sized (ncells², never corpus rows). One assignment pass, one
    * cell aggregate.
    */
  def knnSilhouette(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    val centsDf = cents.toSeq.toDF("cell", "cvec")
    val mem = assignTo(e, cents)
      .join(broadcast(centsDf), "cell")
      .select(col("cell"),
        (lit(1.0) - VectorDistance.cosine(col("vec"), col("cvec")))
          .as("d"))
      .select(col("cell"),
        expr("CAST(round(d * 1000000) AS BIGINT)").as("micro"))
    val ag = mem.groupBy("cell")
      .agg(count(lit(1)).as("n"), sum("micro").as("sm"))
    val sep = centsDf.as("ca")
      .join(broadcast(centsDf.select(col("cell").as("cellb"),
        col("cvec").as("cvb"))), col("cell") =!= col("cellb"))
      .select(col("cell"),
        (lit(1.0) - VectorDistance.cosine(col("cvec"), col("cvb")))
          .as("db"))
      .groupBy("cell").agg(min("db").as("b"))
    val a = col("sm").cast("double") / col("n") / lit(1000000.0)
    ag.join(sep, "cell")
      .where(greatest(col("b"), a) > 0)
      .select(col("cell"), col("n").as("n_members"),
        round(a, 6).as("a_intra"),
        round(col("b"), 6).as("b_sep"),
        round((col("b") - a) / greatest(col("b"), a), 4).as("silhouette"))
      .orderBy("cell")
  }

  // ------------------------------------------------------ IVF + SQ8

  private def quantPath(indexPath: String): String = indexPath + "_quant"

  /** IVF index with SQ8 codes alongside the float vectors — the
    * FAISS IVF+ScalarQuantizer layout as a TABLE: partitioned by
    * cell for probe pruning, with a 1-byte-per-dim `code` column so
    * the probe scan reads ~4× fewer bytes and the float `vec` column
    * is only decoded for the shortlist (column pruning keeps it out
    * of the first scan entirely — visible in ReadSchema).
    */
  def ivfSq8BuildIndex(s: SparkSession, emb: DataFrame, path: String,
                       stride: Long = 200): Unit = {
    import s.implicits._
    val (mins, maxs) = Quant.trainMinMax(emb)
    val cents = collectCentroids(kmeansCentroids(emb, stride))
    // sidecars first; the index's _SUCCESS (written last) is the
    // publish marker
    mins.indices.map(i => (i, mins(i), maxs(i))).toDF("dim", "mn", "mx")
      .write.mode("overwrite").parquet(quantPath(path))
    cents.toSeq.toDF("cell", "cvec")
      .write.mode("overwrite").parquet(centroidsPath(path))
    writeCellPartitioned(assignTo(emb, cents)
      .withColumn("code",
        graft.functions.Quantize.encode(col("vec"), mins, maxs)), path)
  }

  /** Probe-pruned quantized search: partition-filtered scan of
    * (id, code) only → code-space L2 shortlist of rerank·k per query
    * → exact float rerank reading `vec` just for the probed cells'
    * shortlist join. Compounds the three scale primitives: partition
    * pruning (IO: skip unprobed cells), SQ8 (bandwidth: 4× smaller
    * probe scan), bounded-heap top-k (shuffle: O(Q·k·partitions)).
    */
  def ivfSq8Search(s: SparkSession, path: String, queries: DataFrame,
                   k: Int, nprobe: Int = 2, rerank: Int = 4): DataFrame = {
    val qp = s.read.parquet(quantPath(path))
      .orderBy("dim").collect()
    val mins = qp.map(_.getDouble(1))
    val maxs = qp.map(_.getDouble(2))
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(path)).select(col("cell"), col("cvec")))
    val probes = queries.select(col("qid"),
      explode(centroidTopM(col("qvec"), cents, nprobe)).as("p"),
      graft.functions.Quantize.encode(col("qvec"), mins, maxs).as("qcode"))
      .select(col("qid"), col("qcode"), col("p.cell").as("cell"))
    val cells = probes.select("cell").distinct().collect().map(_.getLong(0))
    // scan 1: codes only (vec pruned away), partition-filtered;
    // shortlist ranks by code-space COSINE — the same metric the
    // exact rerank uses (an L2 shortlist would cut small-norm but
    // direction-aligned vectors that cosine ranks near)
    val codes = s.read.parquet(path)
      .where(col("cell").isin(cells.toIndexedSeq: _*))
      .select("id", "code", "cell")
    val scored = codes.join(probes, "cell")
      .select(col("qid"),
        (-graft.functions.Quantize.cosine(col("code"), col("qcode"),
          mins, maxs)).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    val shortlist = TopKAgg.shortlist(scored, k * rerank)
    // scan 2: float vectors, still partition-filtered, joined to the
    // shortlist only
    val vecs = s.read.parquet(path)
      .where(col("cell").isin(cells.toIndexedSeq: _*))
      .select("id", "vec")
    val rescored = shortlist
      .join(vecs, "id")
      .join(broadcast(queries.select("qid", "qvec")), "qid")
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(rescored, k)
  }

  def ivfSq8Query(s: SparkSession, dir: String): DataFrame = {
    val path = graft.IndexCache.dirFor(dir, "ivfsq8").toString
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      ivfSq8BuildIndex(s, e, path)
    }
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    ivfSq8Search(s, path, q, k = 10, nprobe = 2)
  }

  // ------------------------------------------------------- IVF + BQ

  private def bqMeansPath(indexPath: String): String = indexPath + "_bqmeans"

  /** IVF index with 1-bit sign codes beside the float vectors — the
    * FAISS binary-IVF layout as a table, the smallest probe scan of
    * the family: 2 longs per row (vs 64 bytes SQ8, 256 bytes float),
    * compared with two xor+popcount ops. Same composition as
    * [[ivfSq8BuildIndex]]: cell partitioning for probe pruning,
    * code column for the cheap shortlist, float column only decoded
    * for the shortlist rerank.
    */
  def ivfBqBuildIndex(s: SparkSession, emb: DataFrame, path: String,
                      stride: Long = 200): Unit = {
    import s.implicits._
    val mus = BinQuant.trainMeans(emb)
    val cents = collectCentroids(kmeansCentroids(emb, stride))
    // sidecars first; the index's _SUCCESS (written last) publishes
    mus.indices.map(i => (i, mus(i))).toDF("dim", "mu")
      .write.mode("overwrite").parquet(bqMeansPath(path))
    cents.toSeq.toDF("cell", "cvec")
      .write.mode("overwrite").parquet(centroidsPath(path))
    writeCellPartitioned(assignTo(emb, cents)
      .withColumn("code",
        graft.functions.BinaryQuant.pack(col("vec"), mus)), path)
  }

  /** Probe-pruned binary search: partition-filtered (id, code) scan
    * → Hamming shortlist of rerank·k per query → exact float cosine
    * rerank reading `vec` only for the probed cells' shortlist.
    * Hamming of mean-centered sign codes approximates angular order
    * (see [[graft.operators.BinQuant]]) — the right proxy for the
    * cosine rerank.
    */
  def ivfBqSearch(s: SparkSession, path: String, queries: DataFrame,
                  k: Int, nprobe: Int = 2, rerank: Int = 4): DataFrame = {
    val mus = s.read.parquet(bqMeansPath(path))
      .orderBy("dim").collect().map(_.getDouble(1))
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(path)).select(col("cell"), col("cvec")))
    val probes = queries.select(col("qid"),
      explode(centroidTopM(col("qvec"), cents, nprobe)).as("p"),
      graft.functions.BinaryQuant.pack(col("qvec"), mus).as("qcode"))
      .select(col("qid"), col("qcode"), col("p.cell").as("cell"))
    val cells = probes.select("cell").distinct().collect().map(_.getLong(0))
    val codes = s.read.parquet(path)
      .where(col("cell").isin(cells.toIndexedSeq: _*))
      .select("id", "code", "cell")
    val scored = codes.join(probes, "cell")
      .select(col("qid"),
        graft.functions.BinaryQuant.hamming(col("code"), col("qcode"))
          .cast("double").as("key"),
        col("id"))
      .where(col("key").isNotNull)
    val shortlist = TopKAgg.shortlist(scored, k * rerank)
    val vecs = s.read.parquet(path)
      .where(col("cell").isin(cells.toIndexedSeq: _*))
      .select("id", "vec")
    val rescored = shortlist
      .join(vecs, "id")
      .join(broadcast(queries.select("qid", "qvec")), "qid")
      .select(col("qid"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(rescored, k)
  }

  def ivfBqQuery(s: SparkSession, dir: String): DataFrame = {
    val path = graft.IndexCache.dirFor(dir, "ivfbq").toString
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      ivfBqBuildIndex(s, e, path)
    }
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    ivfBqSearch(s, path, q, k = 10, nprobe = 2)
  }

  /** Assign arrival rows (id, vec) under an index's STORED centroids
    * — the frozen-quantizer arrival path shared by upsert
    * ([[ivfIndexUpsert]] does this internally) and the streaming
    * SemDeDup maintenance: an arrival must land in the cells the
    * index already has, never silently re-train them.
    */
  def assignUnderStored(s: SparkSession, indexPath: String,
                        rows: DataFrame): DataFrame = {
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(indexPath))
        .select(col("cell"), col("cvec")))
    assignTo(rows, cents)
  }

  /** LWW-upsert into a persisted IVF index WITHOUT a full rebuild —
    * the reference's `upsert` (remove-old + insert-new,
    * vector_database.cc:53) against the table-shaped index: only
    * cells that currently hold an updated id or receive a new
    * assignment are rewritten, through dynamic partition overwrite.
    * At 1000 cells and a 0.1% daily churn, that is rewriting a
    * handful of partitions instead of re-clustering 100 TB. Uses the
    * STORED centroids (an upsert must not silently re-train the
    * quantizer); periodic re-clustering is a separate full rebuild.
    */
  def ivfIndexUpsert(s: SparkSession, path: String,
                     updates: DataFrame): Unit = {
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(path)).select(col("cell"), col("cvec")))
    // LWW WITHIN the batch too: duplicate ids in one updates frame
    // collapse before assignment — by greatest `version` when the
    // batch carries one (the WAL's tiebreak), else to a single
    // arbitrary row (no version ⇒ no defined winner; the contract is
    // only that exactly one survives).
    val onePerId =
      if (updates.columns.contains("version"))
        updates.groupBy("id")
          .agg(max_by(col("vec"), col("version")).as("vec"))
      else updates.dropDuplicates("id")
    val assigned = assignTo(onePerId.select("id", "vec"), cents)
    val idx = s.read.parquet(path)
    val updatedIds = broadcast(assigned.select("id"))
    // cells holding an old version of an updated id — a column-pruned
    // (id, cell) scan, no vectors read
    val touched = idx.join(updatedIds, "id")
      .select(col("cell").cast("long")).distinct()
      .unionByName(assigned.select(col("cell")).distinct())
      .distinct().collect().map(_.getLong(0))
    val survivors = idx
      .where(col("cell").isin(touched.toIndexedSeq: _*))
      .join(updatedIds, Seq("id"), "left_anti")
      .select(col("id"), col("vec"), col("cell").cast("long").as("cell"))
    val replacement = survivors.unionByName(assigned)
    publishTouchedCells(s, path, touched, replacement)
  }

  /** DELETE ids from a persisted IVF index without a rebuild — the
    * tombstone surface the reference never grew (no delete endpoint
    * in http_server.cc; FaissIndex::remove_vectors exists only as
    * upsert's remove-old step). Only the cells that HOLD a deleted id
    * are rewritten (dynamic partition overwrite); cells the deletion
    * empties are removed entirely. The touched set comes from a
    * column-pruned (id, cell) scan — no vectors read — and the
    * rewrite is bounded by churn locality, never index size.
    * Centroids are untouched (deletion must not silently re-train
    * the quantizer any more than upsert may).
    */
  def ivfIndexDelete(s: SparkSession, path: String,
                     ids: DataFrame): Unit = {
    val delIds = broadcast(ids.select("id").distinct())
    val idx = s.read.parquet(path)
    val touched = idx.join(delIds, "id")
      .select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0))
    if (touched.isEmpty) return  // nothing referenced the index
    val survivors = idx
      .where(col("cell").isin(touched.toIndexedSeq: _*))
      .join(delIds, Seq("id"), "left_anti")
      .select(col("id"), col("vec"), col("cell").cast("long").as("cell"))
    publishTouchedCells(s, path, touched, survivors)
  }

  /** Publish tail shared by [[ivfIndexUpsert]] and [[ivfIndexRepair]]:
    * dynamic-partition-overwrite the replacement rows, then delete
    * touched cells the replacement emptied (dynamic overwrite only
    * replaces partitions PRESENT in the written data, so an emptied
    * cell's stale files would otherwise survive).
    *
    * CRASH WINDOW (documented contract): the overwrite and the
    * empty-cell deletion are separate filesystem steps. A crash
    * between them leaves a moved-away id present in both its old
    * (stale, emptied-but-undeleted) cell and its new cell. Readers
    * then see duplicate ids until [[ivfIndexRepair]] runs; repair is
    * idempotent, so "run repair after any interrupted maintenance op"
    * is the recovery story (the reference replays its WAL from the
    * last snapshot on the same reasoning — persistence.cc recovery).
    */
  private[operators] def publishTouchedCells(s: SparkSession, path: String,
                                  touched: Array[Long],
                                  replacementRows: DataFrame): Unit =
    TablePublish.publishTouched(s, path, "cell", touched, replacementRows)

  /** Repair an index left inconsistent by a crash inside
    * [[publishTouchedCells]]'s window: any id present in more than
    * one cell keeps only its most recently WRITTEN copy (the
    * overwrite's files postdate the stale cell's — discriminated by
    * `_metadata.file_modification_time`, no content comparison), and
    * cells emptied by discarding stale copies are deleted. Idempotent:
    * a repaired index has no duplicate ids, so a second run touches
    * nothing; a crash inside repair itself is recovered by re-running
    * repair.
    */
  def ivfIndexRepair(s: SparkSession, path: String): Unit = {
    val idx = s.read.parquet(path)
      .select(col("id"), col("vec"), col("cell").cast("long").as("cell"),
        col("_metadata.file_modification_time").as("mt"))
    // duplicate ids via a column-pruned (id, cell) pass
    val dupIds = idx.groupBy("id")
      .agg(count(lit(1)).as("n")).where(col("n") > 1).select("id")
    val touched = idx.join(broadcast(dupIds), "id")
      .select("cell").distinct().collect().map(_.getLong(0))
    if (touched.nonEmpty) {
      val inTouched = idx.where(col("cell").isin(touched.toIndexedSeq: _*))
      // per dup id keep max-mtime copy; ids unique in the index pass
      // through the same aggregate unchanged (their single row is its
      // own max) — one groupBy over only the touched cells' rows
      val replacement = inTouched
        .groupBy("id")
        .agg(max_by(struct(col("vec"), col("cell")), col("mt")).as("r"))
        .select(col("id"), col("r.vec").as("vec"), col("r.cell").as("cell"))
      publishTouchedCells(s, path, touched, replacement)
    }
  }

  /** Compact fragmented cells: every [[ivfIndexUpsert]] appends new
    * files to the cells it touches (dynamic overwrite writes one file
    * per task per cell), so a churn-heavy index accumulates small
    * files and probe scans pay per-file open/footer costs. Cells
    * holding more than `maxFilesPerCell` data files are rewritten —
    * content-identical, repartitioned by cell so each compacted cell
    * lands in exactly one task = one file. Untouched cells keep their
    * files; same crash window + repair story as
    * [[publishTouchedCells]].
    */
  def ivfCompact(s: SparkSession, path: String,
                 maxFilesPerCell: Int = 1): Unit = {
    // driver-side listing is O(cells + files): fine at the thousands
    // of coarse cells an IVF index holds (ncells ~ √corpus is the
    // usual sizing); a billions-of-files layout would move this to a
    // distributed listing job, same rewrite logic
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    val fragmented = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .filter { st =>
        fs.listStatus(st.getPath)
          .count(f => f.getPath.getName.endsWith(".parquet")) > maxFilesPerCell
      }
      .map(_.getPath.getName.stripPrefix("cell=").toLong)
      .toArray
    if (fragmented.nonEmpty) {
      val rows = s.read.parquet(path)
        .where(col("cell").isin(fragmented.toIndexedSeq: _*))
        .select(col("id"), col("vec"), col("cell").cast("long").as("cell"))
        .repartition(col("cell"))
      publishTouchedCells(s, path, fragmented, rows)
    }
  }

  /** Per-cell index statistics as a relational plan — the
    * observability surface that drives maintenance: `n_rows` shows
    * cell balance (skewed cells → recluster), `n_files` shows
    * fragmentation (the [[ivfCompact]] trigger). One column-pruned
    * scan (the cell partition value plus file-path metadata — the
    * vector bytes are never read) with partial aggregation, so the
    * report stays metadata-weight at any index size; the driver-side
    * listing inside ivfCompact is its O(cells) trigger twin.
    */
  def ivfIndexStats(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
      .select(col("cell").cast("long").as("cell"),
        col("_metadata.file_path").as("f"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("f")).as("n_files"))
      .orderBy("cell")

  /** Periodic re-clustering: retrain centroids on the CURRENT corpus
    * and build a fresh index at `newPath`, reading the rows out of
    * the old index. Upserts never retrain (the quantizer must stay
    * fixed between rebuilds — drifted data degrades recall, it never
    * corrupts results), so this is the maintenance op that restores
    * cell balance after sustained churn. Builds BESIDE the old index
    * — the old path stays fully queryable — because an in-place
    * rebuild of 100 TB would either double-buffer the whole corpus in
    * memory or read files mid-overwrite. The atomic switch to the new
    * index is the MANIFEST's job: see [[ivfReclusterPublish]].
    */
  def ivfRecluster(s: SparkSession, path: String, newPath: String,
                   stride: Long = 200): Unit = {
    require(newPath != path, "recluster builds beside the old index")
    ivfBuildIndex(s, s.read.parquet(path).select("id", "vec"),
      newPath, stride)
  }

  // ------------------------------------------------------ index manifest

  /** The manifest pointer under a versioned index root — the
    * reference's `lastSnapshotID` persisted to `snapshots_MaxLogID`
    * (reference persistence.cc:140,156-158): readers resolve the
    * CURRENT index through one small pointer object instead of
    * hard-coding a path, and maintenance publishes a rebuilt index by
    * flipping that pointer, never by mutating the live directory.
    * Layout: `root/v<N>/` version directories + `root/_current`
    * holding the live version's name.
    */
  // Pointer mechanics now live in [[Manifest]] (shared with the BM25
  // postings index — the contract is index-type-agnostic); these
  // remain the IVF-named surface AnnSpec and operators pin.
  def ivfPublish(s: SparkSession, root: String, version: String): Unit =
    Manifest.publish(s, root, version)

  def ivfCurrent(s: SparkSession, root: String): Option[String] =
    Manifest.current(s, root)

  /** Absolute path of the live index under `root`. */
  def ivfResolve(s: SparkSession, root: String): String =
    Manifest.resolve(s, root)

  private def nextVersion(s: SparkSession, root: String): String =
    Manifest.nextVersion(s, root)

  /** First build under a versioned root: build v1 beside nothing,
    * publish the pointer last. Returns the live version's path.
    */
  def ivfBuildPublished(s: SparkSession, emb: DataFrame, root: String,
                        stride: Long = 200): String = {
    val next = nextVersion(s, root)
    val path = new org.apache.hadoop.fs.Path(root, next).toString
    ivfBuildIndex(s, emb, path, stride)
    ivfPublish(s, root, next)
    path
  }

  /** Recluster THROUGH the manifest: retrain beside the live version
    * at `v<n+1>`, then flip the pointer. The old version serves every
    * read issued before the flip and stays on disk after it (GC of
    * superseded versions is a separate retention decision); a crash
    * anywhere before the final rename leaves the old index live and
    * the half-built version invisible — re-running is safe because
    * the build writes mode=overwrite into its own version directory.
    */
  def ivfReclusterPublish(s: SparkSession, root: String,
                          stride: Long = 200): String = {
    val cur = ivfResolve(s, root)
    val next = nextVersion(s, root)
    val nextPath = new org.apache.hadoop.fs.Path(root, next).toString
    ivfRecluster(s, cur, nextPath, stride)
    ivfPublish(s, root, next)
    nextPath
  }

  /** Retention for superseded versions under a manifest root: keep
    * the live version (always) plus the `keep` highest-numbered
    * versions; delete the rest with their sidecar directories
    * (`v<N>_centroids` / `_quant` / `_pq`). The pointer is read
    * FIRST, so the live index is never deleted even if a publish
    * races this; a crash mid-GC leaves some garbage directories that
    * the next run removes — idempotent, like ivfIndexRepair. Returns
    * the deleted directory names.
    */
  def ivfGcVersions(s: SparkSession, root: String,
                    keep: Int = 1): Seq[String] =
    Manifest.gcVersions(s, root, keep)

  /** Search the live version under a versioned root — the reader-side
    * half of the manifest contract.
    */
  def ivfSearchCurrent(s: SparkSession, root: String, queries: DataFrame,
                       k: Int, nprobe: Int = 2): DataFrame =
    ivfSearchIndexed(s, ivfResolve(s, root), queries, k, nprobe)

  /** Persisted-index twin of [[ivfQuery]] (same stride/k/nprobe, so
    * AnnSpec can assert result equality); index built once per sf dir
    * under the IndexCache root.
    */
  private def indexedPath(s: SparkSession, dir: String): String = {
    val path = graft.IndexCache.dirFor(dir, "ivfidx").toString
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "_SUCCESS"))) {
      // label rides into the index (assignTo passes it through) so
      // the filtered variant can predicate on it; unfiltered readers
      // prune it at the scan
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          col("label"))
      ivfBuildIndex(s, e, path)
    }
    path
  }

  // ----------------------------------------------------- multitenancy

  /** MULTITENANT LAYOUT + SEARCH (r13 — the multitenancy page every
    * production vector store ships: Qdrant's payload-partitioned
    * collections, "one collection, tenant-keyed partitions" over
    * "a collection per tenant"): the corpus persists PARTITIONED BY
    * TENANT, and a search batch scopes each request to its own
    * tenant — the batch's present tenants (a request-sized job)
    * become literal partition filters, so a tenant's search reads
    * ONLY that tenant's directories however many tenants share the
    * collection (the isolation AND the cost model: tenant cost ∝
    * tenant size, not collection size). Scoping rides the same
    * tenant-equality join predicate that scoped the scan, so a row
    * can never leak across tenants even if pruning were disabled —
    * AnnSpec pins both the pruning and the leak-freedom.
    */
  def tenantBuildIndex(s: SparkSession, emb: DataFrame,
                       path: String): Unit =
    emb.write.mode("overwrite").partitionBy("tenant").parquet(path)

  /** @param queries (qid, qvec, tenant) — each request searches its
    *                own tenant only; cosine ranking, k per request
    */
  def tenantSearch(s: SparkSession, path: String, queries: DataFrame,
                   k: Int): DataFrame = {
    val tenants = queries.select("tenant").distinct()
      .collect().map(_.getLong(0))
    val data = s.read.parquet(path)
      .where(col("tenant").isin(tenants.toIndexedSeq: _*))
    val q = broadcast(queries.select(col("qid"), col("qvec"),
      col("tenant"),
      sqrt(VectorDistance.dot(col("qvec"), col("qvec"))).as("_qn")))
    val d = data.select(col("id"), col("vec"), col("tenant"),
      sqrt(VectorDistance.dot(col("vec"), col("vec"))).as("_n"))
    val denom = col("_n") * col("_qn")
    val score = when(denom === 0.0, lit(null).cast("double"))
      .otherwise(VectorDistance.dot(col("vec"), col("qvec")) / denom)
    val scored = d.join(q, "tenant")
      .select(col("qid"), (-score).as("key"), col("id"))
      .where(col("key").isNotNull)
    topKPerQuery(scored, k)
  }

  private def tenantPath(s: SparkSession, dir: String): String =
    graft.IndexCache.dirFor(dir, "tenantidx").toString

  /** Surface query: tenant = label mod 4; six requests, each scoped
    * to its id-mod-4 tenant.
    */
  def tenantQuery(s: SparkSession, dir: String): DataFrame = {
    val path = tenantPath(s, dir)
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          (col("label").cast("long") % 4).as("tenant"))
      tenantBuildIndex(s, e, path)
    }
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        (col("vec_id") % 4).as("tenant"))
    tenantSearch(s, path, q, k = 10)
  }

  def ivfIndexedQuery(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    ivfSearchIndexed(s, indexedPath(s, dir), q, k = 10, nprobe = 2)
  }

  /** RANGE SEARCH THROUGH THE INDEX — FAISS's `range_search` on the
    * IVF layout (the flat `vdb_range_search` touches the whole
    * corpus; this probes): all neighbors at cosine ≥ threshold among
    * the probed cells' members. Same partition-pruned scan as
    * [[ivfSearchIndexed]], but the selection is a map-side threshold
    * filter inside the scan's codegen stage — no heap, no per-query
    * state, output ∝ matches. Carries FAISS's recall caveat: a
    * neighbor in an unprobed cell is missed (nprobe buys recall), so
    * result ⊆ the flat range search — pinned in AnnSpec.
    */
  def ivfRangeSearchIndexed(s: SparkSession, path: String,
                            queries: DataFrame, threshold: Double,
                            nprobe: Int = 2): DataFrame = {
    val cents = collectCentroids(
      s.read.parquet(centroidsPath(path)).select(col("cell"), col("cvec")))
    val probes = queries.select(col("qid"), col("qvec"),
      explode(centroidTopM(col("qvec"), cents, nprobe)).as("p"))
      .select(col("qid"), col("qvec"), col("p.cell").as("cell"))
    val cells = probes.select("cell").distinct().collect().map(_.getLong(0))
    s.read.parquet(path)
      .where(col("cell").isin(cells.toIndexedSeq: _*))
      .join(broadcast(probes), "cell")
      .select(col("qid"), col("id").as("nn_id"),
        VectorDistance.cosine(col("vec"), col("qvec")).as("s"))
      .where(col("s").isNotNull && col("s") >= threshold)
      .select(col("qid"), col("nn_id"), round(col("s"), 4).as("score"))
      .orderBy("qid", "nn_id")
  }

  def ivfRangeQuery(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    ivfRangeSearchIndexed(s, indexedPath(s, dir), q, threshold = 0.25)
  }

  /** Recall@k of the approximate IVF path against the exact kNN —
    * the evaluation harness AS a query: the go/no-go report an
    * operator reads before trading exactness for probe pruning
    * (every ANN system publishes this curve; here it is one oracled
    * plan). Both legs are deterministic, so even the recall numbers
    * hash-match the DuckDB mirror; the semi-join and count run over
    * Q×k rows — evaluation cost is query-sized, the corpus is
    * touched only by the two searches themselves.
    */
  def ivfRecallReport(s: SparkSession, dir: String): DataFrame =
    recallReport(s, dir, ivfQuery(s, dir), k = 10)

  /** Same report for the sign-LSH path — probe-set pruning (IVF) and
    * bucket-overlap pruning (LSH) trade recall differently; the pair
    * of reports is the apples-to-apples comparison.
    *
    * Both reports take no k: it is pinned to the 10 the surface
    * queries (ivfQuery/lshQuery) return — a caller-supplied k would
    * silently disagree with the approximate leg's depth.
    */
  def lshRecallReport(s: SparkSession, dir: String): DataFrame =
    recallReport(s, dir, lshQuery(s, dir), k = 10)

  /** Same report for the hierarchical graph path — completes the
    * recall-report trio (IVF probe pruning / LSH bucket pruning /
    * graph traversal pruning each trade recall differently).
    */
  def hnswRecallReport(s: SparkSession, dir: String): DataFrame =
    recallReport(s, dir, hnswQuery(s, dir), k = 10)

  /** EMBEDDING NORM AUDIT — the one-row data-quality gate an
    * embedding pipeline runs before indexing: count, min/max/mean
    * L2 norm, and the number of (near-)zero vectors (which break
    * cosine and collapse to noise under every quantizer). Norms are
    * 4dp-quantized to integer micro-units before the corpus
    * aggregate (fold-order-proof); one projection, one 1-row agg.
    */
  def embedNormAudit(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("embedding").cast("array<double>").as("vd"))
    val micro = expr("CAST(round(sqrt(aggregate(zip_with(vd, vd, " +
      "(x, y) -> x * y), 0D, (acc, x) -> acc + x)) * 10000) AS BIGINT)")
    e.select(micro.as("m"))
      .agg(count(lit(1)).as("n_vecs"),
        min("m").as("mnm"), max("m").as("mxm"), sum("m").as("sm"),
        sum(when(col("m") === 0L, 1L).otherwise(0L)).as("n_zero"))
      .select(col("n_vecs"),
        round(col("mnm").cast("double") / 10000.0, 4).as("min_norm"),
        round(col("mxm").cast("double") / 10000.0, 4).as("max_norm"),
        round(col("sm").cast("double") / col("n_vecs") / 10000.0, 6)
          .as("avg_norm"),
        col("n_zero"))
  }

  /** PER-DIMENSION VARIANCE report — the dead-dimension detector
    * that pairs with [[embedNormAudit]] (norms say the vectors are
    * alive; this says WHICH axes are): per dim, mean and variance
    * from exact integer micro moments (n, Σx, Σx² — the
    * events_ab_test rule applied per dimension), plus a dead flag at
    * variance < 1e-6 (a collapsed axis wastes quantizer budget and
    * adds nothing to any distance). One posexplode pass, 64-row
    * aggregate.
    *
    * Overflow headroom: with |e| ≤ ~1 the micro moment m is ≤ 10⁴,
    * so qx ≤ n·10⁸ and the numerator n·qx reaches n²·10⁸ — a BIGINT
    * would wrap silently past n ≈ 3·10⁵ vectors (Spark wraps where
    * DuckDB's HUGEINT keeps going, diverging exactly where the
    * micro-moment discipline promises bit-equality). The numerator
    * therefore rides DecimalType(38,0) (exact to 10³⁸, i.e. n up to
    * ~10¹⁵) and only the final ratio drops to double — mirroring the
    * oracle's HUGEINT-then-CAST path.
    */
  def dimVariance(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val num = col("n").cast(dec) * col("qx").cast(dec) -
      col("sx").cast(dec) * col("sx").cast(dec)
    Tables.embeddings(s, dir)
      .select(posexplode(expr(
        "transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) " +
          "* 10000) AS BIGINT))")).as(Seq("dim", "m")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("m").as("sx"),
        sum(expr("m * m")).as("qx"))
      .select(col("dim").cast("long").as("dim"),
        round(col("sx").cast("double") / col("n") / lit(10000.0), 4)
          .as("mean"),
        round(num.cast("double")
          / (col("n") * (col("n") - 1)).cast("double")
          / lit(100000000.0), 6).as("variance"),
        (num.cast("double")
          / (col("n") * (col("n") - 1)).cast("double")
          / lit(100000000.0) < lit(1e-6)).as("is_dead"))
      .orderBy("dim")
  }

  /** RECALL-vs-PREFIX-DIMS CURVE for matryoshka embeddings — the MRL
    * tuning table ([[graft.operators.Knn.mrlSearch]]'s knob): per
    * prefix width 4/8/16/32, recall@10 of the PURE-PREFIX cosine
    * ranking (no rerank — the curve isolates what the truncated
    * representation alone retains) against the full-dim exact scan.
    * The ivfRecallCurve discipline verbatim: legs unioned with a
    * literal width column, zero-hit widths kept by the left join
    * (the r9 advice fix), evaluation joins Q×k-sized.
    */
  def mrlRecallCurve(s: SparkSession, dir: String, k: Int = 10,
                     dims: Seq[Int] = Seq(4, 8, 16, 32)): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Knn.topK(e, q, k, Knn.Metric.Cosine)
      .select(col("qid"), col("nn_id")).localCheckpoint(true)
    val legs = dims.map { d =>
      Knn.topK(
          e.select(col("id"), slice(col("vec"), 1, d).as("vec")),
          q.select(col("qid"), slice(col("qvec"), 1, d).as("qvec")),
          k, Knn.Metric.Cosine)
        .select(lit(d.toLong).as("prefix_dims"), col("qid"), col("nn_id"))
    }.reduce(_ unionByName _)
    val hits = legs.join(exact, Seq("qid", "nn_id"), "left_semi")
      .groupBy("prefix_dims").agg(count(lit(1)).as("n_hits"))
    val den = exact.agg(count(lit(1)).as("denom"))
    dims.map(_.toLong).toDF("prefix_dims")
      .join(hits, Seq("prefix_dims"), "left")
      .crossJoin(broadcast(den))
      .select(col("prefix_dims"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("denom"), 4).as("recall"))
      .orderBy("prefix_dims")
  }

  /** EMBEDDING-SPACE DRIFT between ingest waves — the vector twin of
    * the scalar PSI monitor (corpus_drift_psi): both waves assigned
    * to the SHARED IVF quantizer's cells (the reference model — at
    * scale, the persisted index's centroids), PSI over the cell
    * occupancy distributions with +1 smoothing. A high value means
    * the new wave lands in different regions of embedding space than
    * the old — re-train the quantizer / re-balance the index before
    * recall quietly degrades. Per-cell terms are micro-unit-rounded
    * BIGINTs before the final sum (order-free — the driftPsi
    * discipline), so the one output row is exact-compare-stable.
    */
  def embedDriftPsi(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    val cells = assignTo(e, cents)
      .select(col("cell"), (col("id") % 2 === 0).as("ha"))
      .groupBy("cell")
      .agg(sum(when(col("ha"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("ha"), 1L).otherwise(0L)).as("cb"))
    val tot = cells.agg(sum("ca").as("ta"), sum("cb").as("tb"),
      count(lit(1)).as("nc"))
    cells.crossJoin(broadcast(tot))
      .select(col("ta"), col("tb"), col("nc"),
        // PURE-DOUBLE term (r13, fuzz seed 707): `* 1.0 /` made this
        // DECIMAL arithmetic in Spark — a coarser value than the
        // oracle's double division (DuckDB promotes the quotient to
        // DOUBLE), and the ~1e-2 gap flipped the micro-round when a
        // term landed near .5 (y 2652.4934 vs 2652.5014). Explicit
        // DOUBLE casts reproduce the oracle's IEEE ops bit-for-bit,
        // ln included (verified on the planted cells).
        expr("CAST(round((CAST(ca + 1 AS DOUBLE) / CAST(ta + nc AS DOUBLE) " +
          "- CAST(cb + 1 AS DOUBLE) / CAST(tb + nc AS DOUBLE)) " +
          "* ln((CAST(ca + 1 AS DOUBLE) / CAST(ta + nc AS DOUBLE)) " +
          "/ (CAST(cb + 1 AS DOUBLE) / CAST(tb + nc AS DOUBLE))) " +
          "* CAST(1000000 AS DOUBLE)) AS BIGINT)")
          .as("tm"))
      .agg(max("ta").as("n_a"), max("tb").as("n_b"),
        max("nc").as("n_cells"),
        // exact integer half-up at 4dp (r13, fuzz seed 707: the
        // micro-sum hit S = 3950 → 0.003950 exactly, where the two
        // engines' double-path roundings split 0.0039 / 0.0040; PSI
        // terms are ≥ 0 so the floor form IS half-up)
        expr("CAST((sum(tm) * 20000 + 1000000) div 2000000 AS DOUBLE)" +
          " / 10000.0").as("psi"))
  }

  /** RECALL-vs-NPROBE CURVE — the tuning table every ANN deployment
    * publishes before picking its operating point: one row per probe
    * width, overall recall@k against the exact scan. All legs share
    * the cached trained centroids, so the curve isolates the probe
    * width (the one knob) from training noise; evaluation joins are
    * Q×k-sized — the corpus is touched only by the searches.
    */
  def ivfRecallCurve(s: SparkSession, dir: String,
                     nprobes: Seq[Int] = Seq(1, 2, 3, 4),
                     k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    val exact = Knn.topK(e, q, k, Knn.Metric.Cosine)
      .select(col("qid"), col("nn_id"))
    val legs = nprobes.map { np =>
      ivfSearchWith(e, q, k, np, cents)
        .select(col("qid"), col("nn_id"))
        .withColumn("nprobe", lit(np.toLong))
    }.reduce(_ unionByName _)
    val denom = (k * q.count()).toDouble
    // One row per requested width even at zero recall: a left join
    // against the literal nprobe list (the oracle's per-width UNION
    // ALL always emits a row; a semi-then-group would drop the group).
    import s.implicits._
    val widths = nprobes.map(_.toLong).toDF("nprobe")
    val hits = legs.join(exact, Seq("qid", "nn_id"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("h"))
    widths.join(hits, Seq("nprobe"), "left")
      .select(col("nprobe"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        round(coalesce(col("h"), lit(0L)).cast("double") / lit(denom), 4)
          .as("recall"))
      .orderBy("nprobe")
  }

  /** COST/RECALL FRONTIER — the operating-point table an ANN
    * deployment actually tunes with: [[ivfRecallCurve]] says what
    * each probe width BUYS (recall), this adds what it COSTS
    * (candidate rows scanned — the probe's IO/arithmetic, summed
    * from the probed cells' sizes). One row per width: recall@10,
    * total candidates, candidates/query. The cell-size table comes
    * from the assignment (cells-sized, broadcast); evaluation joins
    * stay Q×k-sized; the corpus is touched by the searches only.
    */
  def ivfParetoTuning(s: SparkSession, dir: String,
                      nprobes: Seq[Int] = Seq(1, 2, 3, 4),
                      k: Int = 10): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val nq = q.count()
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    val csize = broadcast(assignTo(e, cents)
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("csz")))
    // ranked probe cells once at max width; width w's cells = rank ≤ w
    val ranked = q.select(col("qid"),
        posexplode(centroidTopM(col("qvec"), cents, nprobes.max)))
      .select(col("qid"), (col("pos") + 1).as("rnk"),
        col("col.cell").as("cell"))
      .join(csize, "cell")
      .localCheckpoint(true)
    val exact = Knn.topK(e, q, k, Knn.Metric.Cosine)
      .select(col("qid"), col("nn_id"))
      .localCheckpoint(true)
    // ONE probe pass serves every width (r16; was one ivfSearchWith
    // corpus-probe pass PER width — 4 probe scans, 76 exchanges).
    // Probe sets are NESTED (centroidTopM is a deterministic full
    // sort, so width w's cells are exactly the rank-≤w prefix of the
    // max-width ranking): score each candidate once at max width
    // carrying its cell rank, charge the row to every width ≥ its
    // rank (a lambda filter over the literal width list), and run the
    // same TopK heap per (width, qid). Per-width candidate multisets,
    // scores, and heap tie-breaks are identical to the per-width
    // ivfSearchWith legs by construction; the oracle pins the rest.
    val probesMax = q.select(col("qid"), col("qvec"),
        posexplode(centroidTopM(col("qvec"), cents, nprobes.max)))
      .select(col("qid"), col("qvec"), (col("pos") + 1).as("rnk"),
        col("col.cell").as("cell"))
    val scoredAll = assignTo(e, cents).join(probesMax, "cell")
      .select(col("qid"), col("rnk"),
        (-VectorDistance.cosine(col("vec"), col("qvec"))).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    val widthList = nprobes.mkString(",")
    val agg = TopKAgg.topK(k)
    val perWidth = scoredAll
      .select(col("qid"), col("key"), col("id"),
        explode(expr(
          s"filter(array($widthList), w -> w >= rnk)")).as("np"))
      .groupBy("np", "qid")
      .agg(agg(col("key"), col("id")).as("top"))
      .select(col("np").cast("long").as("nprobe"), col("qid"),
        explode(expr("transform(top.items, x -> x.id)")).as("nn_id"))
    val hitsAll = perWidth
      .join(exact, Seq("qid", "nn_id"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("h"))
    val costAll = ranked
      .select(col("csz"),
        explode(expr(
          s"filter(array($widthList), w -> w >= rnk)")).as("np"))
      .groupBy(col("np").cast("long").as("nprobe"))
      .agg(sum("csz").as("nc"))
    val rows = hitsAll.join(costAll, Seq("nprobe"), "full_outer")
    nprobes.map(_.toLong).toDF("nprobe").join(rows, Seq("nprobe"), "left")
      .select(col("nprobe"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        round(coalesce(col("h"), lit(0L)).cast("double")
          / (lit(k) * lit(nq)).cast("double"), 4).as("recall"),
        coalesce(col("nc"), lit(0L)).as("n_candidates"),
        round(coalesce(col("nc"), lit(0L)).cast("double")
          / lit(nq).cast("double"), 4).as("cand_per_query"))
      .orderBy("nprobe")
  }

  /** RECALL@K CURVE — the cutoff-depth companion of
    * [[ivfRecallCurve]]'s probe-width curve: one row per k in
    * {1, 5, 10}, overall recall of the IVF path's top-k against the
    * exact top-k at the SAME k (recall@1 asks "is the single nearest
    * neighbor found", the metric that gates point-lookup use).
    * Both ranked lists are computed ONCE at max k and checkpointed
    * (Q×k rows); each curve point is a rank-filtered semi-join —
    * evaluation cost is query-sized, the corpus is touched only by
    * the two searches.
    */
  def ivfRecallAtK(s: SparkSession, dir: String,
                   ks: Seq[Int] = Seq(1, 5, 10)): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val nq = q.count()
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    val kmax = ks.max
    val approx = ivfSearchWith(e, q, kmax, 2, cents)
      .select(col("qid"), col("rk"), col("nn_id"))
      .localCheckpoint(true)
    val exact = Knn.topK(e, q, kmax, Knn.Metric.Cosine)
      .select(col("qid"), col("rk").as("xrk"), col("nn_id"))
      .localCheckpoint(true)
    val hits = ks.map { k =>
      approx.where(col("rk") <= k)
        .join(exact.where(col("xrk") <= k).select("qid", "nn_id"),
          Seq("qid", "nn_id"), "left_semi")
        .agg(count(lit(1)).as("h"))
        .select(lit(k.toLong).as("k"), col("h"))
    }.reduce(_ unionByName _)
    // the literal k list anchors zero-recall rows (the recall-curve
    // zero-hit rule)
    ks.map(_.toLong).toDF("k").join(hits, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        round(coalesce(col("h"), lit(0L)).cast("double")
          / (col("k") * lit(nq)).cast("double"), 4).as("recall"))
      .orderBy("k")
  }

  private def recallReport(s: SparkSession, dir: String,
                           approxResult: DataFrame, k: Int): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Knn.topK(e, q, k, Knn.Metric.Cosine)
      .select(col("qid"), col("nn_id"))
    approxResult.select(col("qid"), col("nn_id"))
      .join(exact, Seq("qid", "nn_id"), "left_semi")
      .groupBy("qid")
      .agg(count(lit(1)).as("hits"))
      .select(col("qid"), col("hits"),
        round(col("hits").cast("double") / lit(k.toDouble), 4)
          .as("recall"))
      .orderBy("qid")
  }

  /** Filtered search on the indexed approximate path — the
    * reference's filtered HNSW search as partition pruning composed
    * with a scan-pushed predicate.
    */
  def ivfIndexedFilteredQuery(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    ivfSearchIndexed(s, indexedPath(s, dir), q, k = 10, nprobe = 2,
      filter = Some(col("label").between(2, 6)))
  }

  // ------------------------------------------- adaptive filtered search

  /** ADAPTIVE filtered search — the pre/post-filter PLANNING decision
    * every production vector store makes (Qdrant/Weaviate/Milvus all
    * ship a selectivity-based switch; the reference always
    * bitmap-prefilters, filter_index.cc:62, which is only the right
    * call when the filter is selective):
    *
    *  - SELECTIVE predicate → exact brute force over the matching
    *    rows only ("prefilter_exact"): the match set is small, so
    *    scanning it exactly is cheaper than probing — and recall is
    *    perfect, where filtered-ANN might fill < k from probed cells;
    *  - BROAD predicate → the filtered-IVF path ("ivf_filtered"):
    *    partition-pruned probes with the predicate pushed into the
    *    probe scan — brute force over a near-full corpus is exactly
    *    what the index exists to avoid.
    *
    * The decision inputs come from STATISTICS, never a corpus scan:
    * the exact total is read from the build-time planner sidecar
    * ([[writePlanStats]] — 1 meta row), and the predicate's match
    * count is estimated by evaluating it over the sidecar's
    * deterministic md5-hash sample (≈ corpus/[[planSampleMod]]
    * metadata-only rows) and scaling up, floored at 1 (no predicate
    * estimates to exactly zero — the standard planner convention,
    * and what keeps a forced-selFactor flip well-defined). At 100 TB
    * the planning step reads kilobytes; the previous form paid two
    * full-corpus jobs, which costs more than either branch. The
    * sample is md5-keyed so it cannot alias against value or modulo
    * predicates, and it is bit-identical in DuckDB — the WHOLE
    * PLANNER stays oracle-mirrorable: the oracle computes the same
    * estimate and gates the same two branch CTEs. Threshold:
    * selective iff `est · selFactor < total`. A pre-sidecar index
    * gets ANALYZE-on-demand: one metadata-weight scan builds the
    * sidecar, then planning is sidecar-only forever.
    *
    * `pred` may reference only metadata columns (id, label, …) —
    * the sample drops vectors.
    */
  def adaptiveFilteredSearch(s: SparkSession, path: String,
                             queries: DataFrame, k: Int,
                             pred: org.apache.spark.sql.Column,
                             nprobe: Int = 2,
                             selFactor: Long = 10): (String, DataFrame) = {
    val metaPath = path + "_planstats_meta"
    val fs = new org.apache.hadoop.fs.Path(metaPath)
      .getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(metaPath, "_SUCCESS"))) {
      // ANALYZE on demand for indexes built before the sidecar
      // existed: one metadata-weight scan of the index, persisted so
      // every later plan is stats-only
      writePlanStats(s, s.read.parquet(path), path)
    }
    val meta = s.read.parquet(metaPath).collect()(0)
    val total = meta.getAs[Long]("total")
    val mod = meta.getAs[Long]("sample_mod")
    val est = math.max(
      s.read.parquet(planStatsPath(path)).where(pred).count() * mod, 1L)
    if (est * selFactor < total) {
      val data = s.read.parquet(path).where(pred).select("id", "vec")
      ("prefilter_exact", Knn.topK(data, queries, k, Knn.Metric.Cosine))
    } else
      ("ivf_filtered",
        ivfSearchIndexed(s, path, queries, k, nprobe, Some(pred)))
  }

  /** Surface query: one narrow predicate (label=5 ∧ id≡0 mod 4,
    * ~2.5% — takes the exact prefilter branch) and one broad
    * (label∈[2,6], ~50% — takes the filtered-IVF branch), tagged
    * with the strategy the planner chose.
    */
  def adaptiveFilterQuery(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val path = indexedPath(s, dir)
    val (st1, r1) = adaptiveFilteredSearch(s, path, q, 10,
      col("label") === 5 && col("id") % 4 === 0)
    val (st2, r2) = adaptiveFilteredSearch(s, path, q, 10,
      col("label").between(2, 6))
    r1.select(lit("narrow").as("pred"), lit(st1).as("strategy"),
        col("qid"), col("rk"), col("nn_id"), col("score"))
      .unionByName(r2.select(lit("broad").as("pred"), lit(st2).as("strategy"),
        col("qid"), col("rk"), col("nn_id"), col("score")))
      .orderBy("pred", "qid", "rk")
  }

  /** EMBEDDING OUTLIERS — the mislabeled/noise-vector report a
    * curation pass runs before training: per IVF cell, each member's
    * cosine-to-centroid z-score, worst [[Knn]] 20 corpus-wide.
    *
    * Bit-deterministic by construction: the cosine is quantized to
    * integer micro-units (the [[clusterStats]] discipline), per-cell
    * (n, Σx, Σx²) are exact BIGINTs, and
    * z = (x·n − S) / sqrt(n·Q − S²) evaluates on those integers —
    * identical doubles on both engines, so even the global top-20
    * cut is tie-stable. Cells of one member (no variance) are
    * excluded on the exact integer guard. Plan shape: one corpus
    * scan → cell-keyed aggregate → broadcast-back join → global
    * TakeOrdered(20) — no full sort materializes.
    */
  def embedOutliers(s: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = centCache.computeIfAbsent((dir, 200L),
      _ => collectCentroids(kmeansCentroids(e, 200)))
    val centsDf = cents.toSeq.toDF("cell", "cvec")
    val base = assignTo(e, cents)
      .join(broadcast(centsDf), "cell")
      .select(col("id"), col("cell"),
        VectorDistance.cosine(col("vec"), col("cvec")).as("cos"))
      .withColumn("micro", expr("cast(round(cos * 10000) as bigint)"))
    val stats = base.groupBy("cell")
      .agg(count(lit(1)).as("n"), sum("micro").as("sm"),
        sum(col("micro") * col("micro")).as("q"))
    base.join(stats, "cell")
      // a degenerate (zero-norm) vector has no cosine and therefore
      // no outlier score: its NULL micro must not ride a NULLS-FIRST
      // ascending sort into the report (r12 fuzz); both engines rank
      // only real-cosine rows
      .where(col("micro").isNotNull && col("n") > 1 &&
        col("n") * col("q") - col("sm") * col("sm") > 0)
      .withColumn("z",
        (col("micro") * col("n") - col("sm")).cast("double")
          / sqrt((col("n") * col("q") - col("sm") * col("sm"))
            .cast("double")))
      .select(col("id"), col("cell"),
        round(col("micro") / 10000.0, 4).as("cos"),
        round(col("z"), 4).as("z"))
      .orderBy(col("z"), col("id"))
      .limit(topN)
  }

  // ------------------------------------------------- ranking evaluation

  /** nDCG@10 of the IVF probe path against exact cosine ground truth
    * — the GRADED companion to [[ivfRecallReport]]: recall treats
    * rank 1 and rank 10 alike, nDCG charges an approximate index for
    * returning the right neighbors in the wrong order. Relevance of
    * the exact rank-r neighbor is (11−r); DCG discounts by
    * log2(rank+1) over the system's own ordering; a system hit
    * outside the exact top-10 contributes 0.
    *
    * Both legs are the already-bounded search outputs (Q×k rows), so
    * the whole report is joins and aggregates on query-batch-sized
    * frames — evaluation never rescans the corpus beyond the two
    * searches themselves.
    */
  def ndcgReport(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Knn.topK(e, q, 10, Knn.Metric.Cosine)
      .select(col("qid"), col("rk"), col("nn_id"),
        (lit(11L) - col("rk")).as("rel"))
    val idcg = exact.groupBy("qid")
      .agg(sum(col("rel").cast("double") / log2(col("rk") + 1))
        .as("idcg"))
    val dcg = ivfQuery(s, dir).select(col("qid"), col("rk"), col("nn_id"))
      .join(exact.select("qid", "nn_id", "rel"), Seq("qid", "nn_id"),
        "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("rel"), lit(0L)).cast("double")
        / log2(col("rk") + 1)).as("dcg"))
    dcg.join(idcg, "qid")
      .select(col("qid"), round(col("dcg"), 4).as("dcg"),
        round(col("idcg"), 4).as("idcg"),
        round(col("dcg") / col("idcg"), 4).as("ndcg"))
      .orderBy("qid")
  }

  /** MEAN-RECIPROCAL-RANK report for the IVF probe against the exact
    * cosine top-10 — the third leg of the search-eval family
    * (recall@k measures coverage, nDCG graded ordering, MRR the
    * "how far down is the first right answer" latency a RAG caller
    * feels). Per query: `rr_top1` is 1/rank of THE exact nearest
    * neighbor inside the system list (0 if the probe missed it),
    * `rr_first_rel` is 1/rank of the first system result that is any
    * exact-top-10 member, `n_rel_found` the overlap size. Same
    * judgment-free oracle discipline as [[ndcgReport]]: the exact
    * scan IS the relevance labeling.
    */
  def mrrReport(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Knn.topK(e, q, 10, Knn.Metric.Cosine)
      .select(col("qid"), col("rk").as("erk"), col("nn_id"))
    val sys = ivfQuery(s, dir).select(col("qid"), col("rk"), col("nn_id"))
    val hits = sys.join(exact, Seq("qid", "nn_id"))
    val top1 = hits.where(col("erk") === 1)
      .groupBy("qid").agg(min("rk").as("r1"))
    val any = hits.groupBy("qid")
      .agg(min("rk").as("ra"), count(lit(1)).as("n_rel_found"))
    q.select("qid")
      .join(top1, Seq("qid"), "left")
      .join(any, Seq("qid"), "left")
      .select(col("qid"),
        round(coalesce(lit(1.0) / col("r1"), lit(0.0)), 4).as("rr_top1"),
        round(coalesce(lit(1.0) / col("ra"), lit(0.0)), 4)
          .as("rr_first_rel"),
        coalesce(col("n_rel_found"), lit(0L)).as("n_rel_found"))
      .orderBy("qid")
  }

  // --------------------------------------------- random projection kNN

  /** Projected dimensionality for [[rpKnnQuery]]. */
  val RpDims = 16

  /** RP candidate depth before the exact rerank. 100 (not 50): the
    * driver's embeddings are near-isotropic, the hardest case for a
    * 16-dim JL sketch — candidate depth, not projected dimensionality,
    * buys recall there (measured 0.46 @ 50 cand vs 0.72 @ 100 on the
    * sf0.001 slice; 32 dims at the same depth bought only +0.02).
    */
  val RpCand = 100

  /** Deterministic ±1 projection matrix: sign(j,i) from the md5
    * prefix of "j|i" — the same hash-derived-weights discipline as
    * the sign-LSH tables, so the DuckDB mirror regenerates the
    * identical matrix from the identical strings.
    */
  private[graft] def rpSigns: Array[Array[Double]] =
    Array.tabulate(RpDims, 64)((j, i) =>
      if (graft.functions.HashUtils
        .md5Prefix60(s"$j|$i".getBytes("UTF-8")) % 2 == 0) 1.0 else -1.0)

  /** RANDOM-PROJECTION kNN: Johnson–Lindenstrauss-style dimension
    * reduction as the candidate generator — project corpus and
    * queries to [[RpDims]] dims through the fixed ±1 matrix, take the
    * top-[[RpCand]] by L2 in the projected space, rerank those
    * exactly by cosine on the original vectors.
    *
    * vs sign-LSH (bucket collision): RP keeps a RANKED candidate
    * space, so recall degrades gracefully instead of cliff-dropping
    * when a neighbor misses every bucket. The projection is a
    * per-row map over codegen'd dot kernels against broadcast
    * literal rows (no shuffle, no UDF); the candidate stage is the
    * standard bounded heap (Q×[[RpCand]] rows), and the rerank is a
    * candidate-sized join — corpus work is one projected scan,
    * exactly the IVF probe cost model with a 4× narrower vector.
    */
  def rpKnnQuery(s: SparkSession, dir: String): DataFrame = {
    val signs = rpSigns
    def proj(v: org.apache.spark.sql.Column) =
      array((0 until RpDims).map(j =>
        VectorDistance.dot(v, typedLit(signs(j).toSeq))): _*)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cand = Knn.topK(
        e.select(col("id"), proj(col("vec")).as("vec")),
        q.select(col("qid"), proj(col("qvec")).as("qvec")),
        RpCand, Knn.Metric.L2)
      .select("qid", "nn_id")
    // exact cosine rerank over the Q×RpCand candidate set — the
    // window partitions are candidate-sized, never corpus-sized
    val rer = cand
      .join(e.select(col("id").as("nn_id"), col("vec")), "nn_id")
      .join(broadcast(q), "qid")
      .withColumn("s", {
        val denom = sqrt(VectorDistance.dot(col("vec"), col("vec"))) *
          sqrt(VectorDistance.dot(col("qvec"), col("qvec")))
        when(denom === 0.0, lit(null).cast("double"))
          .otherwise(VectorDistance.dot(col("vec"), col("qvec")) / denom)
      })
      .where(col("s").isNotNull)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("s").desc, col("nn_id"))
    rer.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 10)
      .select(col("qid"), col("rk"), col("nn_id"),
        round(col("s"), 4).as("score"))
      .orderBy("qid", "rk")
  }
}
