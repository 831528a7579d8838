package graft

import org.apache.spark.sql.SparkSession

/** One place that owns the session configuration every graft
  * entrypoint (Verify, Bench, ScalaTest suites) shares, so that
  * read-behavior flags are set once at build time rather than as
  * hidden side effects of loader calls.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      // native kernels reachable from spark.sql(...) too
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
      // parquet reader rejects outright; read the raw int64 nanos
      // session-wide (Tables.events converts to timestamp explicitly).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // static conf: the default 100-entry codegen class cache evicts
      // across a 36-query suite, discarding JIT-warm generated classes
      // and forcing recompile + re-interpretation (10-40x first-run
      // penalties reappear mid-suite)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
}
