package graft.operators

import org.apache.spark.sql.functions._

/** OPQ cold-build phase decomposition (diagnostic main, not a driver
  * surface): the ann_ivf_opq scale leg is build-dominated (warm
  * serve measures ~2s at x16 where the cold leg reads ~110-127s),
  * and the §4 component model — moments pass + constant driver
  * greedy + 2 Lloyd codebook rounds + assignment + partitioned
  * write — prices it an order of magnitude cheaper. Times each
  * phase separately against a throwaway index path on the given
  * replica dir so the expensive one is named, not guessed.
  */
object OpqDiag {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "16").toInt
    val dir = graft.ScaleStress.materialize(spark, sfDir, factor)
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[opqdiag] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val perm = timed("opq_perm (moments + greedy)") { Pq.opqPerm(spark, dir) }
    val path = java.nio.file.Files
      .createTempDirectory("opqdiag").resolve("idx").toString
    // build decomposition: codebook training alone, then the rest.
    // rotOld is the pre-r16 composed form (64 unrolled element_at) —
    // kept as the A/B leg that demonstrates the codegen-fallback
    // cliff; rot is the VecPermute kernel the operators now use
    val rotOld = org.apache.spark.sql.functions.array(
      perm.toIndexedSeq.map(p =>
        org.apache.spark.sql.functions.element_at(col("vec"), p + 1)): _*)
    val rot = graft.functions.PqCodec.permute(col("vec"), perm.toIndexedSeq)
    timed("  codebook train (2 Lloyd rounds)") {
      Pq.trainCodebook(e.select(col("id"), rot.as("vec")), stride = 25)
    }
    timed("  ivf centroids (kmeans + collect)") {
      Ann.collectCentroids(Ann.kmeansCentroids(e, 200))
    }
    val cents = timed("  centroids again (cache check)") {
      Ann.collectCentroids(Ann.kmeansCentroids(e, 200))
    }
    timed("  assign only") {
      graft.Bench.materialize(Ann.assignTo(e, cents))
    }
    val cb = Pq.trainCodebook(e.select(col("id"), rot.as("vec")), stride = 25)
    timed("  assign + rotate UNROLLED (the codegen cliff)") {
      graft.Bench.materialize(Ann.assignTo(e, cents)
        .withColumn("rvec", rotOld))
    }
    timed("  assign + rotate kernel (VecPermute)") {
      graft.Bench.materialize(Ann.assignTo(e, cents)
        .withColumn("rvec", rot))
    }
    timed("  assign + encode unrotated") {
      graft.Bench.materialize(Ann.assignTo(e, cents)
        .withColumn("code", graft.functions.PqCodec.encode(
          col("vec"), cb, Pq.M, Pq.DSUB, Pq.KSUB)))
    }
    timed("  rotate + encode without assign") {
      graft.Bench.materialize(e
        .withColumn("code", graft.functions.PqCodec.encode(
          rot, cb, Pq.M, Pq.DSUB, Pq.KSUB)))
    }
    timed("  assign + rotate + encode (no write)") {
      graft.Bench.materialize(Ann.assignTo(e, cents)
        .withColumn("code", graft.functions.PqCodec.encode(
          rot, cb, Pq.M, Pq.DSUB, Pq.KSUB)))
    }
    timed("build_index (codebook + assign + write)") {
      Pq.ivfOpqBuildIndex(spark, e, perm, path)
    }
    val q = graft.Tables.embeddings(spark, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    timed("search (warm index)") {
      graft.Bench.materialize(Pq.ivfOpqSearch(spark, path, q, k = 10))
    }
    spark.stop()
  }
}
