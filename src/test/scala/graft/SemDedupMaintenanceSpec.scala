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

      // redelivery of a batch WITH SURVIVORS: a vector that exists in
      // the index ONLY as its own upserted row (the negated corpus
      // vector 0 — near-exact match to nothing at tau=0.99). First
      // delivery: survivor, upserted. Redelivery (same batch, same
      // tau): the arrival's own row is now in its cell at cosine 1.0
      // — without the pid =!= id guard it would falsely rewrite the
      // drop dir with keeper == doc_id; with it, the dir stays empty
      // and the index stays converged.
      val u = emb.where(col("id") === 0)
        .select(lit(800000L).as("id"),
          transform(col("vec"), x => x * -1.0f).as("vec"))
      SemDedupMaintenance.fold(idx, drops, tau = 0.99)(u, 5L)
      val nAfterU = spark.read.parquet(idx).count()
      assert(nAfterU == n0 + nA + 1, "unique arrival must survive")
      assert(spark.read.parquet(s"$drops/batch=5").count() == 0)
      SemDedupMaintenance.fold(idx, drops, tau = 0.99)(u, 5L)
      assert(spark.read.parquet(idx).count() == nAfterU,
        "redelivery must not grow the index")
      assert(spark.read.parquet(s"$drops/batch=5").count() == 0,
        "redelivered survivor must not self-drop against its own row")

      // LWW within a batch: two versions of one id, the v2 vector a
      // corpus original (drops), v1 junk — max_by(version) must pick
      // v2 deterministically
      val lww = emb.where(col("id") === 0)
        .select(lit(900000L).as("id"), col("vec"), lit(2L).as("version"))
        .unionByName(emb.where(col("id") === 0)
          .select(lit(900000L).as("id"),
            transform(col("vec"), x => x * -1.0f).as("vec"),
            lit(1L).as("version")))
      SemDedupMaintenance.fold(idx, drops, tau = 0.35)(lww, 4L)
      val d4 = spark.read.parquet(s"$drops/batch=4").collect()
      assert(d4.length == 1 && d4.head.getLong(2) == 0L,
        "LWW must score the version-2 vector (drops against id 0)")
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }
}
