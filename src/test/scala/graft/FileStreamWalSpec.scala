package graft

import graft.sources.WalSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The WAL as a FILE stream: text files of reference-format lines
  * (persistence.cc writeWALLog) land in a directory and are parsed +
  * replayed incrementally — the storage-backed twin of the
  * MemoryStream specs, proving the same parse/replay plan runs over
  * `readStream.text`.
  */
class FileStreamWalSpec extends SparkSuite {

  test("WAL text files stream-parse and replay to the batch result") {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "walstream")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectory(inDir)
    try {
      val lines = WalSource.syntheticWal(spark, sf).collect().map(_.getString(0))
      // two "WAL segments" arriving as separate files
      val (seg1, seg2) = lines.splitAt(lines.length / 2)
      java.nio.file.Files.write(inDir.resolve("wal-000.log"),
        seg1.mkString("\n").getBytes("UTF-8"))

      val stream = spark.readStream
        .schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir.toString)
      val parsed = WalSource.parse(stream.select(col("value").as("line")))
      val q = parsed.writeStream.format("memory").queryName("walparse")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        java.nio.file.Files.write(inDir.resolve("wal-001.log"),
          seg2.mkString("\n").getBytes("UTF-8"))
        q.processAllAvailable()

        val streamed = WalSource.replay(spark.table("walparse"))
          .collect().toSeq
        val batch = WalSource.replayQuery(spark, sf).collect().toSeq
        assert(streamed == batch)
      } finally q.stop()
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }
}
