package graft

import java.nio.file.Files

import graft.operators.Search
import graft.streaming.PostingsMaintenance
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class PostingsMaintenanceSpec extends SparkSuite {

  test("streamed documents maintain the postings index ≡ full rebuild") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val boot = docs.where(col("doc_id") % 2 === 0)
    val tail = docs.where(col("doc_id") % 2 =!= 0)
      .as[(Long, String)].collect()

    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "bm25stream")
    val idx = root.resolve("idx").toString
    val full = root.resolve("full").toString
    val ckpt = root.resolve("ckpt").toString
    try {
      // bootstrap: batch-build over the existing corpus (the
      // snapshot-then-tail split), then stream the rest in waves
      Search.bm25BuildIndex(spark, boot, idx)
      val stream = MemoryStream[(Long, String)]
      val q = PostingsMaintenance.attach(
        stream.toDF().toDF("doc_id", "text"), idx, ckpt)
      try {
        tail.grouped(math.max(tail.length / 3, 1)).foreach { w =>
          stream.addData(w.toSeq); q.processAllAvailable()
        }
      } finally q.stop()

      Search.bm25BuildIndex(spark, docs, full)
      val queries = Search.fixedQueries(spark)
      val got = Search.bm25SearchIndexed(spark, idx, queries, 10)
        .collect().toSeq
      val want = Search.bm25SearchIndexed(spark, full, queries, 10)
        .collect().toSeq
      assert(got == want && got.nonEmpty,
        "stream-maintained index drifted from the rebuilt index")

      // the waves accreted a file per insert per touched bucket;
      // compaction rewrites fragmented buckets content-identically
      // into one file each, and the search result is unchanged
      Search.bm25IndexCompact(spark, idx)
      val rootPath = new org.apache.hadoop.fs.Path(idx)
      val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      val filesPerBucket = fs.listStatus(rootPath).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("bucket="))
        .map(st => fs.listStatus(st.getPath)
          .count(f => f.getPath.getName.endsWith(".parquet")))
      assert(filesPerBucket.nonEmpty && filesPerBucket.forall(_ <= 1),
        s"buckets still fragmented after compact: $filesPerBucket")
      assert(Search.bm25SearchIndexed(spark, idx, queries, 10)
        .collect().toSeq == want, "compaction changed search results")
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }
}
