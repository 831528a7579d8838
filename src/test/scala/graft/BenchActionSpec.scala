package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** The round-2 bench bug, pinned in CI: timing a query with
  * `.count()` lets Catalyst prune every computed column, so a
  * map-only query benches as a bare row count of the scan. The noop
  * v2 sink must keep the full projection in the executed plan.
  */
class BenchActionSpec extends SparkSuite {

  test("count-style action prunes the metric columns (negative control)") {
    val pruned = graft.operators.TextOps.quality(spark, sf)
      .groupBy().count().queryExecution.optimizedPlan.toString
    assert(!pruned.contains("quality_score"),
      s"count no longer prunes — the positive test below proves nothing:\n$pruned")
  }

  test("bench action keeps every metric column in the optimized plan") {
    @volatile var plan: Option[String] = None
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        if (plan.isEmpty) plan = Some(qe.optimizedPlan.toString)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      Bench.materialize(graft.operators.TextOps.quality(spark, sf))
      // QueryExecutionListener delivery is async on the listener bus
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (plan.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(plan.nonEmpty, "noop write's QueryExecution never observed")
      assert(plan.exists(_.contains("quality_score")),
        s"bench action lost the metric columns:\n${plan.get.take(2000)}")
    } finally spark.listenerManager.unregister(l)
  }
}
