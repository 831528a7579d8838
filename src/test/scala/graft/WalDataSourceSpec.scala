package graft

import java.nio.file.Files

import graft.sources.{WalBinary, WalSource}

class WalDataSourceSpec extends SparkSuite {

  private val segA = Seq(
    """1|1|upsert|{"id":7,"int_field":3}""",
    """2|1|upsert|{"id":8,"int_field":4}""")
  private val segB = Seq(
    """3|2|upsert|{"id":7,"int_field":9}""")

  test("graft-wal format reads a multi-segment dir, one partition each") {
    val dir = Files.createTempDirectory("waldsv2")
    try {
      Files.write(dir.resolve("wal_log_1"), WalBinary.frame(segA))
      Files.write(dir.resolve("wal_log_2"), WalBinary.frame(segB))
      Files.write(dir.resolve("_done"), Array.emptyByteArray)
      val df = spark.read.format("graft-wal").load(dir.toString)
      assert(df.rdd.getNumPartitions == 2, "expected one partition per segment")
      val lines = df.collect().map(_.getString(0)).toSet
      assert(lines == (segA ++ segB).toSet)
      val state = WalSource.replay(WalSource.parse(df))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(state == Set((7L, 9L), (8L, 4L)))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("torn tail frame ends that segment's scan cleanly") {
    val dir = Files.createTempDirectory("waldsv2torn")
    try {
      val whole = WalBinary.frame(segA)
      Files.write(dir.resolve("wal_log_1"), whole.take(whole.length - 3))
      val lines = spark.read.format("graft-wal").load(dir.toString)
        .collect().map(_.getString(0)).toSeq
      assert(lines == segA.dropRight(1))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("micro-batch stream picks up new segments exactly once") {
    val dir = Files.createTempDirectory("waldsv2stream")
    try {
      // names cross the digit-count boundary DELIBERATELY: the
      // reference's rotation ids are not zero-padded, and
      // "wal_log_10" < "wal_log_9" lexicographically — a plain string
      // watermark would lose every segment from 10 up, forever
      Files.write(dir.resolve("wal_log_9"), WalBinary.frame(segA))
      val q = spark.readStream.format("graft-wal").load(dir.toString)
        .writeStream.format("memory").queryName("walseg")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table("walseg").count() == segA.length)
        // a new sealed segment arrives; only IT is read in batch 2
        Files.write(dir.resolve("wal_log_10"), WalBinary.frame(segB))
        q.processAllAvailable()
        val lines = spark.table("walseg").collect()
          .map(_.getString(0)).toSeq
        assert(lines.size == (segA ++ segB).size, "segment re-read or lost")
        assert(lines.toSet == (segA ++ segB).toSet)
        // streamed parse+replay equals the batch replay of the dir
        val streamed = WalSource.replay(
          WalSource.parse(spark.table("walseg"))).collect().toSeq
        val batch = WalSource.replay(WalSource.parse(
          spark.read.format("graft-wal").load(dir.toString)))
          .collect().toSeq
        assert(streamed == batch)
      } finally q.stop()
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("segment ordering is numeric-aware (wal_log_10 after wal_log_9)") {
    import graft.sources.WalDataSource.naturalCompare
    assert(naturalCompare("wal_log_10", "wal_log_9") > 0)
    assert(naturalCompare("wal_log_9", "wal_log_10") < 0)
    assert(naturalCompare("wal_log_2", "wal_log_2") == 0)
    assert(naturalCompare("wal_log_001", "wal_log_2") < 0)
    assert(naturalCompare("a9", "a10b") < 0)
    assert(naturalCompare("seg", "seg1") < 0)
    // numerically-equal runs with different padding are DISTINCT (a
    // tie would let the strict '>' watermark permanently skip a
    // later-arriving same-valued name) and consistently ordered
    assert(naturalCompare("wal_log_01", "wal_log_1") != 0)
    assert(naturalCompare("wal_log_01", "wal_log_1") ==
      -naturalCompare("wal_log_1", "wal_log_01"))
  }

  test("micro-batch stream reads in-place appends to the newest segment") {
    val dir = Files.createTempDirectory("waldsv2grow")
    try {
      // the reference APPENDS to wal_log_<id> until rotation — the
      // stream must ship the new frames of a growing segment, not
      // just whole new files
      Files.write(dir.resolve("wal_log_1"), WalBinary.frame(segA))
      val q = spark.readStream.format("graft-wal").load(dir.toString)
        .writeStream.format("memory").queryName("walgrow")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table("walgrow").count() == segA.length)
        // grow the SAME segment: two new frames, plus a torn half
        // frame an in-progress writer would leave
        val extra = WalBinary.frame(segB)
        val torn = WalBinary.frame(Seq("""4|3|remove|{"id":8}""" * 3))
          .take(11)
        Files.write(dir.resolve("wal_log_1"),
          extra ++ torn, java.nio.file.StandardOpenOption.APPEND)
        q.processAllAvailable()
        val lines = spark.table("walgrow").collect()
          .map(_.getString(0)).toSeq
        // the sealed frames arrived exactly once; the torn tail is
        // NOT consumed (it completes in a later append)
        assert(lines.size == segA.length + segB.length,
          s"grown frames duplicated or lost: $lines")
        assert(lines.toSet == (segA ++ segB).toSet)
        // completing the torn frame delivers it on the next trigger
        val whole = WalBinary.frame(Seq("""4|3|remove|{"id":8}""" * 3))
        Files.write(dir.resolve("wal_log_1"), whole.drop(11),
          java.nio.file.StandardOpenOption.APPEND)
        q.processAllAvailable()
        assert(spark.table("walgrow").count() ==
          segA.length + segB.length + 1)
      } finally q.stop()
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("rotation after growth: old tail and new segment in one batch") {
    val dir = Files.createTempDirectory("waldsv2rot")
    try {
      Files.write(dir.resolve("wal_log_9"), WalBinary.frame(segA))
      val q = spark.readStream.format("graft-wal").load(dir.toString)
        .writeStream.format("memory").queryName("walrot")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // between triggers: the old segment grows AND rotation opens
        // a new one (digit-count boundary again: 10 after 9)
        val tail = Seq("""9|1|upsert|{"id":9,"int_field":1}""")
        Files.write(dir.resolve("wal_log_9"), WalBinary.frame(tail),
          java.nio.file.StandardOpenOption.APPEND)
        Files.write(dir.resolve("wal_log_10"), WalBinary.frame(segB))
        q.processAllAvailable()
        val lines = spark.table("walrot").collect()
          .map(_.getString(0)).toSeq
        assert(lines.size == (segA ++ tail ++ segB).size,
          s"rotation batch wrong: $lines")
        assert(lines.toSet == (segA ++ tail ++ segB).toSet)
      } finally q.stop()
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("maxBytesPerTrigger drains a backlog over multiple bounded batches") {
    val dir = Files.createTempDirectory("waldsv2admit")
    try {
      // a multi-segment backlog present BEFORE the stream starts: the
      // after-downtime shape. Without admission control the first
      // trigger replays it all as ONE batch; with a byte budget it
      // must drain over several, each individually checkpointed,
      // every frame exactly once.
      val segC = Seq("""5|1|upsert|{"id":9,"int_field":5}""")
      Files.write(dir.resolve("wal_log_1"), WalBinary.frame(segA))
      Files.write(dir.resolve("wal_log_2"), WalBinary.frame(segB))
      Files.write(dir.resolve("wal_log_3"), WalBinary.frame(segC))
      val q = spark.readStream.format("graft-wal")
        .option("maxBytesPerTrigger", "40") // < one frame: ≥1/trigger
        .load(dir.toString)
        .writeStream.format("memory").queryName("waladmit")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val lines = spark.table("waladmit").collect()
          .map(_.getString(0)).toSeq
        val all = segA ++ segB ++ segC
        assert(lines.size == all.size, s"not exactly-once: $lines")
        assert(lines.toSet == all.toSet)
        val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
        assert(dataBatches.length > 1,
          s"backlog must drain over >1 micro-batch, got " +
            s"${dataBatches.map(_.numInputRows).mkString(",")}")
        // no batch exceeded the budget by more than one frame's
        // admit-first allowance (frames here are ~40-50 bytes ≈ 1 row)
        assert(dataBatches.forall(_.numInputRows <= 2),
          "a batch admitted far more than the byte budget")
      } finally q.stop()
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("dsv2 route replays identically to the binaryFile route") {
    val viaDsv2 = WalBinary.dsv2ReplayQuery(spark, sf).collect().toSeq
    val viaBinaryFile = WalBinary.binaryReplayQuery(spark, sf).collect().toSeq
    assert(viaDsv2 == viaBinaryFile && viaDsv2.nonEmpty)
  }
}
