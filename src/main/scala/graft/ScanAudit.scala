package graft

/** Diagnostic audit: per-table FileScan counts in each registered
  * query's physical plan; flags repeated scans of the same table.
  * Usage: `runMain graft.ScanAudit [sfDir]` (default sf0.01).
  *
  * Caveat: building a plan EXECUTES any eager stage in the query's
  * construction (localCheckpoints, index builds, fixpoints), so a
  * full audit runs real jobs and can write index artifacts under
  * target/tmp — it is a diagnostic main, not a unit test.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val tables = Seq("lineitem", "orders", "customer", "supplier", "part",
      "nation", "region", "events", "documents", "embeddings")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val p = q(s, dir).queryExecution.executedPlan.toString
        val counts = tables.map { t =>
          t -> p.linesIterator.count(l =>
            l.contains("FileScan") && l.contains(s"$t.parquet"))
        }.filter(_._2 >= 2)
        if (counts.nonEmpty)
          println(s"[scan] $name: " + counts.map { case (t, c) => s"$t=$c" }
            .mkString(", "))
      } catch { case e: Throwable =>
        println(s"[scan] $name ERROR ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(200))
      }
    }
    s.stop()
  }
}
