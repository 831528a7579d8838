package graft

/** Single-probe scale leg driver (diagnostic main, not a driver
  * surface): time ONE registry query across an explicit factor
  * sequence, with the Scale protocol's per-leg hygiene (weak-scaled
  * shuffle width, memo release between legs). Exists to ATTRIBUTE
  * cross-run slope disagreements: the full matrix runs ~20 min on a
  * shared VM whose §4b″ drift spans ±25-50%, so a leg measured early
  * and a leg measured late see different hosts. Repeating a factor
  * around the leg under test (e.g. FACTORS=16,64,16) brackets the
  * long leg with a stable reference — if the two bracket readings
  * agree, the middle leg's ratio against them is drift-free.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   SPARK_GRAFT_PROBE=dedup_containment \
  *   SPARK_GRAFT_FACTORS=16,64,16 sbt "runMain graft.ProbeOne"
  */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = sys.env("SPARK_GRAFT_PROBE")
    val factors = sys.env.getOrElse("SPARK_GRAFT_FACTORS", "16,64,16")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // WIDTH: "weak" (32·factor, the r15 matrix protocol), "session"
    // (leave the GraftSession default width + AQE coalescing — the
    // production config), or an explicit integer
    val widthMode = sys.env.getOrElse("SPARK_GRAFT_PROBE_WIDTH", "weak")
    val legs = factors.map { f =>
      val dir = ScaleStress.materialize(spark, sfDir, f)
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      widthMode match {
        case "weak"    => spark.conf.set(key, (32 * f).toString)
        case "session" => ()
        case w         => spark.conf.set(key, w)
      }
      val t =
        try {
          val t0 = System.nanoTime()
          Bench.materialize(fn(spark, dir))
          (System.nanoTime() - t0) / 1e9
        } finally spark.conf.set(key, prev)
      ScaleStress.releaseLegState(spark)
      f"x$f:$t%.3f"
    }
    println(s"""{"metric":"probe_one","query":"$name","legs":[${
      legs.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
  }
}
