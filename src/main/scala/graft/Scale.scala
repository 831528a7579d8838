package graft

/** Standalone SCALING-PROBE main — the r11 verdict's #1: ScaleStress
  * as a FIRST-CLASS ARTIFACT with its own budget, instead of living
  * off the bench's leftovers (BENCH_r11 degraded 12 of 17 probes to
  * x1-only). Runs the full x1/x4/x16 matrix over every
  * [[ScaleStress.queryNames]] entry PLUS the zipf-skew trio
  * ([[ScaleStress.runSkew]] — one hot key holding ~20% of its table,
  * measuring the whale-basket cap, the df-capped containment
  * blocking, and the per-user sessionize window under real skew),
  * then writes `target/scale.json` and prints the same JSON as its
  * one-line stdout contract.
  *
  * Budget: SPARK_GRAFT_SCALE_BUDGET_SEC (default 3000s — enough for
  * the 17-probe × 3-factor matrix at sf0.1 on a quiet host; the
  * budget check degrades to a partial matrix on a pathological one,
  * exactly like the in-bench probe).
  */
object Scale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SchemaCanary.drift(spark, sfDir).foreach { d =>
      System.err.println(s"[scale] SCHEMA DRIFT: $d")
    }
    val budgetNs = sys.env.getOrElse("SPARK_GRAFT_SCALE_BUDGET_SEC", "3000")
      .toLong * 1000000000L
    val start = System.nanoTime()
    def budgetLeft(): Boolean = System.nanoTime() - start < budgetNs
    val probes = ScaleStress.run(spark, sfDir, budgetLeft)
    val skew = ScaleStress.runSkew(spark, sfDir, budgetLeft)
    def renderSkew(res: Map[String, Map[String, Double]]): String =
      res.toSeq.sortBy(_._1).map { case (name, m) =>
        val inner = Seq("uniform", "skewed", "ratio").filter(m.contains)
          .map(k => f""""$k":${m(k)}%.3f""").mkString(",")
        s""""$name":{$inner}"""
      }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"scale","probes":${ScaleStress.renderJson(probes)},""" +
        s""""skew":${renderSkew(skew)},"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target", "scale.json"), json + "\n")
    catch { case _: Throwable => }
    println(json)
    spark.stop()
  }
}
