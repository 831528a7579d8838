package graft.operators

import org.apache.spark.sql.functions._

/** Containment-blocking cardinality audit (diagnostic main, not a
  * driver surface): the scale matrix measures WALL-CLOCK, which on a
  * shared VM conflates operator work with substrate state (§4b⁵ —
  * the ProbeOne bracket showed a second x16 leg reading 1.7–2.3× the
  * first inside one JVM). The slope claim itself is about WORK, and
  * containment's work is fully determined by four intermediate
  * cardinalities, all deterministic functions of the replica dir:
  * shingle rows (tokenize cost), rare shingles (df∈[2,maxDf] — the
  * blocking keys), candidate pairs (the join fan-out the df cap
  * bounds), verified pairs (output). If each grows ∝ factor across
  * decades, the operator is linear and any wall-clock excess is the
  * substrate, not the plan.
  */
object ContainDiag {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_FACTORS", "4,16,64")
      .split(",").map(_.trim.toInt).toSeq
    val maxDf = 8
    factors.foreach { f =>
      val dir = graft.ScaleStress.materialize(spark, sfDir, f)
      val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
      val ex = Dedup.shingleRows(docs)
      val df = ex.groupBy("s").agg(count(lit(1)).as("df"))
      val rare = df.where(col("df").between(2L, maxDf.toLong))
      val exR = ex.join(rare.select("s"), Seq("s"))
      // candidate pairs before distinct: Σ_rare C(df,2) — the exact
      // join fan-out the df cap bounds
      val fanout = rare.agg(
        sum(expr("df * (df - 1) div 2")).as("pair_fanout"))
        .collect()(0).getLong(0)
      val verified = Dedup.containmentPairs(spark, dir).count()
      val stats = Seq(
        "docs" -> docs.count(),
        "shingle_rows" -> ex.count(),
        "distinct_shingles" -> df.count(),
        "rare_shingles" -> rare.count(),
        "rare_instance_rows" -> exR.count(),
        "pair_fanout" -> fanout,
        "verified_pairs" -> verified)
      println(s"[containdiag] x$f " +
        stats.map { case (k, v) => s"$k=$v" }.mkString(" "))
      graft.ScaleStress.releaseLegState(spark)
    }
    spark.stop()
  }
}
