package graft

import graft.operators.Ann
import graft.streaming.SemDedupMaintenance
import org.apache.spark.sql.functions._

class SemDedupMaintenanceSpec extends SparkSuite {

  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("semdedup maintenance: frozen-centroid drops, survivor " +
      "growth, keeper tie to the corpus original, redelivery " +
      "idempotence") {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "semdd")
    val idx = root.resolve("idx").toString
    val drops = root.resolve("drops").toString
    try {
      Ann.ivfBuildIndex(spark, emb, idx)
      val n0 = spark.read.parquet(idx).count()

      // batch A: copies of every 17th vector under new ids, folded
      // with an unreachable bar — all must ENTER the index
      val a = emb.where(col("id") % 17 === 0)
        .select((col("id") + 200000L).as("id"), col("vec"))
      val nA = a.count()
      SemDedupMaintenance.fold(idx, drops, tau = 2.0)(a, 1L)
      assert(spark.read.parquet(idx).count() == n0 + nA)

      // batch B: the same vectors under higher ids, real bar — every
      // one drops; both candidate keepers (corpus original, batch-A
      // copy) score the IDENTICAL cosine, so the id tiebreak must
      // pick the CORPUS original
      val b = emb.where(col("id") % 17 === 0)
        .select((col("id") + 300000L).as("id"), col("vec"))
      SemDedupMaintenance.fold(idx, drops, tau = 0.35)(b, 2L)
      assert(spark.read.parquet(idx).count() == n0 + nA)
      val d2 = spark.read.parquet(s"$drops/batch=2").collect()
      assert(d2.length == nA)
      assert(d2.forall(r => r.getLong(2) == r.getLong(0) - 300000L))
      assert(d2.forall(_.getDouble(3) >= 0.9999))

      // redelivery of batch B: index unchanged, drop dir rewritten
      // to the same content
      SemDedupMaintenance.fold(idx, drops, tau = 0.35)(b, 2L)
      assert(spark.read.parquet(idx).count() == n0 + nA)
      assert(spark.read.parquet(s"$drops/batch=2").count() == nA)

      // a copy of a doc DROPPED in batch B still drops — its keeper
      // (the corpus original) is in the maintained index
      val c = emb.where(col("id") % 17 === 0)
        .select((col("id") + 400000L).as("id"), col("vec"))
      SemDedupMaintenance.fold(idx, drops, tau = 0.35)(c, 3L)
      assert(spark.read.parquet(idx).count() == n0 + nA)
      val d3 = spark.read.parquet(s"$drops/batch=3").collect()
      assert(d3.length == nA)
      assert(d3.forall(r => r.getLong(2) == r.getLong(0) - 400000L))
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }
}
