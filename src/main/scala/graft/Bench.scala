package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** The timed action. `.count()` is NOT a valid bench action: Catalyst
    * prunes every column the count doesn't need, so a map-only query
    * (text_quality, mm_features, ...) degenerates to a row count of
    * the scan — the "bench" then measures none of the metric
    * expressions (verified round 2: the optimized plan under count()
    * was `Aggregate count(1) ← Project []`). The noop v2 sink
    * materializes EVERY output column of every row (each row is handed
    * to a writer that discards it), so the measured work is the full
    * query, while writing no bytes.
    */
  def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same preflight as Verify: testdata drift must surface as ONE
    // message, not as a bench-invalidating failure cascade (r7)
    SchemaCanary.drift(spark, sfDir).foreach { d =>
      System.err.println(s"[bench] SCHEMA DRIFT: $d")
    }
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir).getParent
      val cand = if (p == null) sfDir else p.resolve("sf0.001").toString
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(cand))) cand
      else sfDir
    }
    // the warm dataset can drift independently of the timed one —
    // surface that too, or a warm-only failure reads as a code bug
    if (warmDir != sfDir) SchemaCanary.drift(spark, warmDir).foreach { d =>
      System.err.println(s"[bench] SCHEMA DRIFT (warm dir): $d")
    }
    // Soft wall-clock budget: if the host hands us a pathological
    // stretch, degrade gracefully (shorter warmup, partial second
    // pass) instead of risking the caller's timeout. The clock starts
    // here — sbt compile time is the caller's, not ours.
    // 1080 (was 900, 780, 480, 420): r10's 480 left pass 2 only
    // 19/256 queries; 780 cut an r11 pass 2 at 224/282. The r15
    // driver run cut pass 2 at 316/392 having spent 870 of the 900s
    // (warmup 26 + pass1 462 + pass2 382 at host drift 1.459) — the
    // remaining 76 queries were the cheapest (~25s), so the budget
    // missed FULL min-of-two by a hair exactly when the host was
    // slow. Full two passes at 392 queries cost ~980s at drift ~1.5
    // and ~760s on a quiet host; 1080 covers the former with margin.
    // Every raise so far ran clean under the caller, and the guard
    // still degrades gracefully (partial pass 2) if the host is
    // pathological.
    val budgetNs = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1080")
      .toLong * 1000000000L
    val start = System.nanoTime()
    def elapsed: Long = System.nanoTime() - start

    // Phase 1 — JIT warmup at the smallest SF: first execution of a
    // query shape runs largely in the JVM interpreter (fresh generated
    // classes + cold md5/shuffle/window substrate) and measures
    // 10-40x slower than steady state (observed: 41.7s -> 1.0s by
    // third run). Warming on sf0.001 JIT-compiles every hot path so
    // the timed sf0.1 pass measures the engine, not HotSpot.
    // Run CONCURRENTLY (Spark's scheduler interleaves jobs): the
    // sf0.001 jobs are dominated by per-job scheduling + codegen
    // latency, not CPU, so wide submission cuts the serial ~70s
    // warmup to a fraction and leaves budget for the second timed
    // pass (r4 spent 95s here at 8-wide and pass 2 only covered
    // 28/64 queries; 16-wide buys that time back).
    // Fail-fast guard: a query whose run dies with an ANALYSIS error
    // is deterministically broken FOR THAT DATASET (same plan, same
    // schemas every phase against one dir), so it is recorded once
    // and skipped in every later phase against that dir — still
    // reporting the -1.0 sentinel. Without this, r7's 26
    // loader-broken queries re-paid full analysis cost in warmup AND
    // both timed passes, burning 191.7s of the 420s budget and
    // invalidating the entire round's measurement. Keyed by
    // (dir, name), NOT name alone: warmup runs against the sibling
    // warm dataset, and schema drift specific to it (the exact
    // vintage SchemaCanary exists for) must not falsely blacklist a
    // query that runs fine at the timed SF (r8 advice).
    val broken = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, String)]()
    def runGuardedAt(dir: String, name: String,
                     df: => DataFrame): Boolean =
      if (broken.contains((dir, name))) false
      else try { materialize(df); true } catch {
        case _: org.apache.spark.sql.AnalysisException =>
          broken.add((dir, name)); false
        case _: Throwable => false
      }
    // optional subset for local iteration (the Verify convention);
    // the driver never sets it, so round benches cover the suite
    val benchQueries = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(names) =>
        val keep = names.split(",").map(_.trim).toSet
        SparkEntry.queries.filter { case (n, _) => keep(n) }
      case None => SparkEntry.queries
    }
    // r12 (r11 verdict #5): warm a REPRESENTATIVE SUBSTRATE SAMPLE,
    // not the whole registry — at 349 queries the full warmup re-ran
    // everything at sf0.001 (124.7s, the second-largest phase) to buy
    // JIT for code the queries SHARE anyway. One query per hot
    // substrate (each VectorDistance kernel, md5/minhash, TopKAgg,
    // PQ/SQ8/BQ codecs, kmeans+beam descent, window exec, rollup,
    // sketch aggregators, BPE, WAL replay, multimodal raster,
    // sampling, graph fixpoints) JIT-compiles the shared paths;
    // per-query generated classes for the REST compile during pass 1
    // and the min-of-two-passes picks the warm pass-2 sample, so the
    // reported numbers stay steady-state.
    val warmupNames = Seq(
      // vector kernels + heap + quantizers + descent
      "vdb_knn_flat_l2", "vdb_knn_cosine", "vdb_knn_flat_linf",
      "ann_ivf", "ann_hnsw", "vdb_knn_pq", "vdb_knn_sq8", "vdb_knn_bq",
      "ann_lsh", "vdb_knn_mrl", "vdb_knn_sparse",
      // md5 hashing families: minhash bands, simhash, winnowing, KMV
      "dedup_minhash_pairs", "dedup_simhash", "dedup_winnowing",
      "sketch_kmv_distinct", "sketch_cms_topk", "sketch_hll_distinct",
      // text substrate: tokenization, n-grams, BPE, BM25, spell
      "text_quality", "text_surprisal", "text_bm25_topk", "bpe_learn",
      "search_spell_correct", "hybrid_search_rrf", "text_rake_keywords",
      // window/rollup/sessionize/pattern exec
      "q_window_topn", "events_rolling_p95", "events_sessionize",
      "events_pattern_match", "events_rollup_cube", "events_gap_fill",
      // join/agg analytics shapes
      "q1_agg", "q3_join", "q9_profit", "events_funnel", "customer_rfm",
      // WAL/state/export/sampling/graph/PCA/multimodal
      "wal_json_replay", "stream_wal_state", "export_shards",
      "corpus_sample_split", "dsir_select", "knn_graph",
      "graph_centrality", "embed_pca_project", "mm_features", "mm_phash")
    // 32-wide (r14, was 16): the sf0.001 jobs are scheduling- and
    // codegen-latency bound, and the committed IndexCache artifacts
    // make the per-query work smaller still — wider submission is
    // the cheap lever against a slow driver host. The per-task gate
    // tightened budget/3 → budget/6: warmup is a fixed phase and
    // must never eat the second timed pass (r13: fixed phases 258s
    // on the driver host starved pass 2 to 146/375).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
    val warmupDone = warmupNames.flatMap(n => benchQueries.get(n).map(n -> _))
      .map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          if (elapsed < budgetNs / 6) runGuardedAt(warmDir, name, fn(spark, warmDir))
      })
    }
    warmupDone.foreach(f => try f.get() catch { case _: Throwable => })
    pool.shutdown()
    // An r14 experiment ADDED a full-registry sf0.01 warm pass here
    // on the theory that per-query generated classes compiling
    // during pass 1 inflated the single-pass numbers of queries the
    // budget cut from pass 2. Measured back-to-back on identical
    // code: pass 1 487.4s with the warm vs 495.9s without (the JIT
    // premise was FALSE — the substrate warmup already amortizes
    // compilation), suite mean 1.015 vs 1.018 s/q, while the warm's
    // ~180s cost starved pass 2 from 260/380 queries to 102/380.
    // Rejected; the budget belongs to the timed passes (§4b).
    val tWarm = elapsed

    // Phase 2 — untimed prebuild at the TARGET SF for queries backed
    // by a persisted physical index (built once per sf dir under the
    // IndexCache root, cached by _SUCCESS). Without this, whichever
    // timed pass runs first is charged the one-time index build
    // (observed round 3: ann_ivf_indexed 16.4s on a fresh target/ vs
    // 0.9s with the index in place) — the bench entry is the SEARCH
    // cost; the build is a separate one-time operation.
    // r14 (VERDICT r13 #1): SKIPPED WHOLESALE when the IndexCache was
    // already fingerprint-fresh for the target dir. r15: the cache
    // trees are no longer git-tracked (r14 verdict #6 — 428 MB of
    // rebuilt binaries per round); the WORKING-TREE cache persists
    // across rounds on this host, a fresh checkout pays this phase
    // once, honestly, outside the timed passes.
    // What prebuild also used to buy (in-memory memo
    // training for ann_ivf/vdb_knn_pq, OS page cache) is pass 1's
    // job under the min-of-two discipline: pass 1 absorbs the
    // one-time cost, pass 2 supplies the steady-state sample. A
    // NEW persisted structure whose artifact is not yet committed
    // follows the same path (its build lands in its own pass-1
    // sample only — 16s worst observed — never in a neighbor's).
    // The phase still runs in full when the fingerprint mismatches:
    // regenerated testdata or a FORMAT bump wipes the cache, and
    // then the builds must stay out of the timed passes.
    // DRIFT ANCHORS (r15, VERDICT r14 #2): three frozen queries whose
    // code predates r12 and is off-limits to optimization, timed
    // (min of 2 reps) right before pass 1 and right after pass 2.
    // They estimate the HOST's speed during this run — the r13/r14
    // rounds measured the same code at 0.97 vs 1.28-1.43 s/q purely
    // from shared-VM drift (§4b″: ±25-30% on back-to-back same-code
    // runs), so the suite mean is reported both raw and
    // anchor-normalized, and the §6 gate reads the normalized one.
    // ANCHOR_REF is the frozen anchor-sum reference, and it MUST be
    // calibrated under the FULL-SUITE protocol: a subset run's JVM
    // is minutes younger at its post measurement, so the first
    // calibration (3-query runs) read 3.30 where full-suite runs
    // read 1.75-3.02 — that mis-reports a quiet host as 0.53x
    // "drift" and would inflate the normalized mean ~2x. Frozen at
    // the min over the two full-suite r15 calibration runs on
    // 2026-08-16 (pre/post 3.73/3.02 and 2.53/1.75, final r15
    // substrate). Re-freezing requires the same two-run §4b
    // evidence the §6 0.660 target itself requires.
    val anchorNames = Seq("q1_agg", "vdb_knn_flat_l2",
      "dedup_minhash_pairs")
    val AnchorRef = 1.75
    def anchorSum(): Double = {
      val ts = anchorNames.map { n =>
        benchQueries.get(n) match {
          case Some(fn) =>
            val reps = (1 to 2).map { _ =>
              val t0 = System.nanoTime()
              if (runGuardedAt(sfDir, n, fn(spark, sfDir)))
                (System.nanoTime() - t0) / 1e9
              else Double.NaN
            }
            reps.min
          case None => Double.NaN
        }
      }
      if (ts.exists(_.isNaN)) Double.NaN else ts.sum
    }

    val cacheWasFresh = IndexCache.wasFresh(sfDir)
    if (!cacheWasFresh)
    Seq("ann_ivf_indexed", "ann_ivf_sq8", "ann_ivf_pq", "ann_ivf_bq",
        "ann_ivf", "vdb_knn_pq", "bucketed_join_agg",
        "dedup_incremental", "train_triplets", "train_triplets_hard",
        "text_bm25_indexed", "ann_ivf_mrl", "events_zorder_skip",
        "ann_adaptive_filter",
        // graph family: knn_graph materializes the memoized edge
        // table, ann_nsw its symmetrized form — the timed pass then
        // measures search, not the one-time graph build
        "knn_graph", "ann_nsw", "embed_knn_clusters",
        // hierarchy: ann_hnsw memoizes the 4 layer-edge tables,
        // ann_hnsw_indexed persists the (layer, cell) table
        "ann_hnsw", "ann_hnsw_indexed",
        // r10 persisted structures: residual IVFPQ index, spell
        // dictionary, indexed range search (shares ann_ivf_indexed's
        // index but listed for the cold-dir case)
        "ann_ivf_pq_res", "search_spell_indexed", "ann_ivf_range",
        // r10 late wave: the maintained daily rollup (build + two
        // generation inserts) and the compacted WAL fixture — the
        // timed entries are serve/replay cost, not the one-time
        // build/compaction
        "events_daily_agg", "wal_compact_replay",
        // r11: the persisted winnowing fingerprint index — timed
        // entry is the batch lookup, not the one-time build
        "dedup_winnow_incremental",
        // r11: the pfx-partitioned prefix dictionary (10th persisted
        // structure) — timed entry is the pruned two-probe serve
        "search_prefix_indexed",
        // r14 completeness audit: every dir-keyed IndexCache artifact
        // now has a prebuild entry (these five were missing — their
        // builds used to land in pass 1 silently): the tenant-
        // partitioned index, the OPQ-permuted PQ index, and the
        // three WAL fixtures
        "vdb_knn_tenant", "ann_ivf_opq", "wal_json_replay",
        "wal_binary_replay", "wal_dsv2_replay")
      .foreach { n =>
      benchQueries.get(n).foreach { fn =>
        if (elapsed < budgetNs / 2) runGuardedAt(sfDir, n, fn(spark, sfDir))
      }
    }
    val tPrebuild = elapsed - tWarm

    // Timed passes. Two samples per query taken a full suite apart:
    // host interference (VM CPU steal) arrives in multi-minute
    // stretches, so back-to-back repeats land in the same slow window
    // — interleaved passes give decorrelated samples, and the
    // per-query min is the steady-state estimate.
    // A failed query records -1.0, not its (fast) wall time to the
    // throw — a fast failure must stay distinguishable from a fast
    // success in the emitted JSON.
    def timeOne(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      if (runGuardedAt(sfDir, name, fn(spark, sfDir))) (System.nanoTime() - t0) / 1e9
      else -1.0
    }
    // anchor walls are timed as their OWN phase (r16 advice): the 2
    // reps × 3 queries ran inside what was reported as pass 1/2, so
    // the phase accounting overstated the passes by the anchor cost.
    // (The reps also hand those 3 member queries extra JIT/page-cache
    // warmth — accepted: they are frozen pre-r12 code whose min-of-two
    // would sit at steady state anyway, and moving them out of the
    // registry would change the suite the 0.660 target was frozen on.)
    val tAnchors0 = elapsed
    val anchorsPre = anchorSum()
    val tAnchorsPre = elapsed - tAnchors0
    val p1 = benchQueries.map { case (name, fn) => name -> timeOne(name, fn) }
    val tP1 = elapsed - tWarm - tPrebuild - tAnchorsPre

    // Second pass, SLOWEST-FIRST and budget-aware per query: if the
    // budget only covers a partial second pass, spend it on the
    // queries with the largest pass-1 samples — exactly the ones a
    // contention window inflates (round 3: a 2.4s query recorded
    // 49.9s because the second pass was skipped wholesale).
    // Cutoff: leave a fixed 30s tail margin rather than 10% of the
    // budget — pass 2 runs slowest-first, so the queries near the
    // cutoff are the FAST ones and a proportional margin (42s of a
    // 420s budget) starves the tail of the suite for no risk
    // reduction (r4: pass2_n 28/64).
    val cutoffNs = math.max((budgetNs * 9) / 10, budgetNs - 30000000000L)
    val order = benchQueries.keys.toSeq.sortBy(n => -p1(n))
    val p2 = scala.collection.mutable.Map[String, Double]()
    order.foreach { name =>
      if (elapsed < cutoffNs)
        p2(name) = timeOne(name, benchQueries(name))
    }
    val tP2 = elapsed - tWarm - tPrebuild - tAnchorsPre - tP1
    val tAnchors1 = elapsed
    val anchorsPost = anchorSum()
    val tAnchors = (tAnchorsPre + (elapsed - tAnchors1)) / 1e9

    // Phase 5 (RETIRED r13, r12 verdict #4): the in-bench ScaleStress
    // probe ran inside the suite's leftover budget on a warm VM, so
    // its slopes measured budget contention, not the operator —
    // BENCH_r12's in-bench dedup_minhash_pairs x16 said 24.5s while
    // the dedicated cold run said 4.3s for the same leg. Two
    // artifacts telling different slope stories would eventually hide
    // a real superlinearity; the standalone `graft.Scale` main (own
    // budget, fresh JVM, cold replica dirs → SCALE_r{N}.json) is now
    // the SOLE slope record, and the freed budget goes to the timed
    // passes (r12 verdict #6 headroom).

    // min over the passes that succeeded; -1.0 only if all failed
    // (max picks the lone success when the other sample is the -1.0
    // sentinel or the query never got a second sample).
    val results = p1.map { case (k, v) =>
      val w = p2.getOrElse(k, -1.0)
      k -> (if (v >= 0 && w >= 0) math.min(v, w) else math.max(v, w))
    }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // drift = best observed anchor state over the run / the frozen
    // quiet-host reference: >1 means this run's numbers carry host
    // slowness the code does not control; mean_norm divides it out.
    // min(pre, post) matches the min-of-two sampling the per-query
    // numbers themselves use.
    val anchorMin = math.min(anchorsPre, anchorsPost) // NaN-propagating
    val drift = anchorMin / AnchorRef
    val meanRaw = if (results.nonEmpty) total / results.size else 0.0
    val anchors =
      if (drift.isNaN) ""
      else f""","anchors":{"pre":$anchorsPre%.2f,"post":$anchorsPost%.2f,""" +
        f""""ref":$AnchorRef%.2f,"drift":$drift%.3f,""" +
        f""""mean_raw":$meanRaw%.4f,"mean_norm":${meanRaw / drift}%.4f}"""
    val phases = f"""{"warmup":${tWarm / 1e9}%.1f,"prebuild":${tPrebuild / 1e9}%.1f,""" +
      f""""pass1":${tP1 / 1e9}%.1f,"pass2":${tP2 / 1e9}%.1f,"pass2_n":${p2.size},""" +
      f""""anchors_sec":$tAnchors%.1f,"cache_fresh":$cacheWasFresh}"""
    def render(qEntries: Seq[String], omitted: Int): String = {
      val om = if (omitted > 0) s""","omitted_fastest":$omitted""" else ""
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":${qEntries.mkString("{", ",", "}")},"nq":${results.size}$om,"phases":$phases$anchors,"sf":"$sfDir"}"""
    }
    // Full-precision artifact with EVERY query — truncation-proof.
    val full = render(results.toSeq.map { case (k, v) => f"""\"$k\":$v%.4f""" }, 0)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target", "bench.json"), full + "\n")
    catch { case _: Throwable => }
    // The stdout line is the driver's contract, but its capture keeps
    // only the LAST 2000 characters of the log — and sbt's `[success]
    // Total time ...` trailer (~80 chars) prints after us. At 100+
    // queries the full per-query map overflows that window and the
    // driver records parsed:null (BENCH_r04/r05: the line's head was
    // cut mid-JSON). Emit the map SLOWEST-FIRST and stop adding
    // entries when the rendered line would pass the budget: the slow
    // queries are the ones the 2×-gate and the judge's plan audit
    // need, `value`/`nq` still cover the whole suite, and the
    // complete map lives in target/bench.json.
    val budget = 1870
    // failures (-1.0 sentinels) sort FIRST, then slowest→fastest: a
    // plain descending sort treats the sentinel as the fastest entry
    // and the trim loop would cut it from the line — a failure must
    // never be silently folded into omitted_fastest
    val bySlow = results.toSeq
      .sortBy { case (_, v) => if (v < 0) Double.MinValue else -v }
      .map { case (k, v) => f"""\"$k\":$v%.3f""" }
    var kept = bySlow.length
    while (kept > 0 && render(bySlow.take(kept), bySlow.length - kept).length > budget)
      kept -= 1
    println(render(bySlow.take(kept), bySlow.length - kept))
    spark.stop()
  }
}
