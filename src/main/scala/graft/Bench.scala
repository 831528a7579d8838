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
    // Untimed warmup at the smallest SF: first execution of a query
    // shape runs largely in the JVM interpreter (fresh generated
    // classes + cold md5/shuffle/window substrate) and measures
    // 10-40x slower than steady state (observed: 41.7s -> 1.0s by
    // third run). Warming on sf0.001 JIT-compiles every hot path so
    // the timed sf0.1 pass measures the engine, not HotSpot.
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir).getParent
      val cand = if (p == null) sfDir else p.resolve("sf0.001").toString
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(cand))) cand
      else sfDir
    }
    // Soft wall-clock budget: if the host hands us a pathological
    // stretch, degrade gracefully (shorter warmup, single timed pass)
    // instead of risking the caller's timeout.
    val budgetNs = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "420")
      .toLong * 1000000000L
    val start = System.nanoTime()
    def elapsed: Long = System.nanoTime() - start
    SparkEntry.queries.foreach { case (_, fn) =>
      if (elapsed < budgetNs / 2)
        try materialize(fn(spark, warmDir)) catch { case _: Throwable => }
    }
    // Best-of-2 with the two samples taken a full suite apart: host
    // interference (VM CPU steal) arrives in multi-minute stretches,
    // so back-to-back repeats land in the same slow window — two
    // interleaved passes give each query decorrelated samples, and
    // the per-query min is the steady-state estimate.
    // A failed query records -1.0, not its (fast) wall time to the
    // throw — a fast failure must stay distinguishable from a fast
    // success in the emitted JSON.
    def pass(): Map[String, Double] = SparkEntry.queries.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { materialize(fn(spark, sfDir)); true }
                 catch { case _: Throwable => false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val p1 = pass()
    val p2 = if (elapsed < (budgetNs * 3) / 4) pass() else p1
    // min over the passes that succeeded; -1.0 only if both failed
    // (max picks the lone success when the other pass is the -1.0
    // sentinel).
    val results = p1.map { case (k, v) =>
      k -> (if (v >= 0 && p2(k) >= 0) math.min(v, p2(k))
            else math.max(v, p2(k)))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
