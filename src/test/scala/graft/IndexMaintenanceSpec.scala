package graft

import java.nio.file.Files

import graft.operators.Ann
import graft.sources.WalBinary
import graft.streaming.IndexMaintenance
import org.apache.spark.sql.functions._

class IndexMaintenanceSpec extends SparkSuite {

  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def walLine(logId: Long, version: Long, id: Long,
                      vec: Array[Float]): String =
    s"""$logId|$version|upsert|{"id":$id,"vectors":[${vec.mkString(",")}]}"""

  private def delLine(logId: Long, version: Long, id: Long): String =
    s"""$logId|$version|delete|{"id":$id}"""

  test("streamed tombstones: delete wave removes ids, later upsert " +
    "resurrects, index ≡ assign of the replayed corpus") {
    import spark.implicits._
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ivfdel")
    val idx = root.resolve("idx").toString
    val wal = root.resolve("wal")
    val ckpt = root.resolve("ckpt").toString
    Files.createDirectories(wal)
    try {
      Ann.ivfBuildIndex(spark, emb, idx)
      val donors = emb.where(col("id") >= 100 && col("id") < 104)
        .orderBy("id").collect().map(_.getSeq[Float](1).toArray)
      // seg1: delete ids 0,5,10; upsert id 1. seg2: resurrect id 5
      // (cross-batch: a later upsert must beat an earlier tombstone),
      // and a same-batch pair where the tombstone wins (id 2 upserted
      // at v2 then deleted at v3 inside one segment).
      val seg1 = Seq(
        delLine(1000L, 2L, 0L), delLine(1001L, 2L, 5L),
        delLine(1002L, 2L, 10L), walLine(1003L, 2L, 1L, donors(0)))
      val seg2 = Seq(
        walLine(2000L, 3L, 5L, donors(1)),
        walLine(2001L, 2L, 2L, donors(2)), delLine(2002L, 3L, 2L))
      Files.write(wal.resolve("wal_log_1"), WalBinary.frame(seg1))
      Files.write(wal.resolve("wal_log_2"), WalBinary.frame(seg2))
      val lines = spark.readStream.format("graft-wal")
        .option("maxBytesPerTrigger", "1500")
        .load(wal.toString)
      val q = IndexMaintenance.attach(lines, idx, ckpt)
      try q.processAllAvailable() finally q.stop()
      // replayed corpus: base minus {0,2,10}, id 1 and 5 updated
      val updates = Seq((1L, donors(0)), (5L, donors(1))).toDF("id", "vec")
      val finalCorpus = emb
        .where(!col("id").isin(0L, 2L, 10L))
        .join(updates.select("id"), Seq("id"), "left_anti")
        .unionByName(updates)
      val cents = spark.read.parquet(idx + "_centroids")
      val want = Ann.ivfAssign(finalCorpus, cents).select("id", "cell")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = spark.read.parquet(idx)
        .select(col("id"), col("cell").cast("long").as("cell"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, "tombstone maintenance drifted from replay")
      // resurrected id carries the later vector
      val v5 = spark.read.parquet(idx).where(col("id") === 5L)
        .select("vec").collect().head.getSeq[Float](0).toArray
      assert(v5.sameElements(donors(1)), "resurrection lost to tombstone")
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("streamed WAL tail maintains the index: bounded batches, LWW, ≡ assign of final corpus") {
    import spark.implicits._
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ivfstream")
    val idx = root.resolve("idx").toString
    val wal = root.resolve("wal")
    val ckpt = root.resolve("ckpt").toString
    Files.createDirectories(wal)
    try {
      // bootstrap: batch-build the snapshot index (reference recovery
      // loads the snapshot first, then replays the WAL tail)
      Ann.ivfBuildIndex(spark, emb, idx)

      // the WAL tail: two binary segments of vector upserts. Donor
      // vectors are other docs' embeddings so cell moves are likely.
      val donors = emb.where(col("id") >= 100 && col("id") < 112)
        .orderBy("id").collect().map(_.getSeq[Float](1).toArray)
      val seg1 = (0 until 6).map(i =>
        walLine(1000L + i, 2L, i.toLong, donors(i)))
      // seg2 re-upserts id 0 (later batch must win) and adds new ids
      val seg2 = Seq(
        walLine(2000L, 3L, 0L, donors(6)),
        walLine(2001L, 2L, 90001L, donors(7)),
        walLine(2002L, 2L, 90002L, donors(8)))
      Files.write(wal.resolve("wal_log_1"), WalBinary.frame(seg1))
      Files.write(wal.resolve("wal_log_2"), WalBinary.frame(seg2))

      // stream the backlog with a byte budget small enough to force
      // multiple micro-batches (each line is ~700B framed)
      val lines = spark.readStream.format("graft-wal")
        .option("maxBytesPerTrigger", "1500")
        .load(wal.toString)
      val q = IndexMaintenance.attach(lines, idx, ckpt)
      try {
        q.processAllAvailable()
        val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
        assert(dataBatches.length > 1,
          s"tail should drain over >1 bounded batch, " +
            s"got ${dataBatches.map(_.numInputRows).mkString(",")}")
      } finally q.stop()

      // the maintained index ≡ assigning the final LWW corpus with
      // the STORED centroids (streaming maintenance never retrains)
      val finalUpdates = Seq(
        (0L, donors(6)), (1L, donors(1)), (2L, donors(2)),
        (3L, donors(3)), (4L, donors(4)), (5L, donors(5)),
        (90001L, donors(7)), (90002L, donors(8))).toDF("id", "vec")
      val finalCorpus = emb
        .join(finalUpdates.select("id"), Seq("id"), "left_anti")
        .unionByName(finalUpdates)
      val cents = spark.read.parquet(idx + "_centroids")
      val want = Ann.ivfAssign(finalCorpus, cents).select("id", "cell")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = spark.read.parquet(idx)
        .select(col("id"), col("cell").cast("long").as("cell"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, "maintained index drifted from the replayed corpus")
      // no duplicate ids anywhere (cross-batch LWW held)
      val dups = spark.read.parquet(idx).groupBy("id")
        .count().where(col("count") > 1).count()
      assert(dups == 0)
      // the later batch's vector won for the re-upserted id
      val v0 = spark.read.parquet(idx).where(col("id") === 0L)
        .select("vec").collect().head.getSeq[Float](0).toArray
      assert(v0.sameElements(donors(6)), "cross-batch LWW lost")
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }
}
