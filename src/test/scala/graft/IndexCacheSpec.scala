package graft

import java.nio.file.{Files, Paths}

/** IndexCache contract (r15, VERDICT r14 #6): the committed artifact
  * trees left git — the working-tree cache plus DETERMINISTIC
  * rebuild-on-miss is now the whole story, so the miss path and the
  * fingerprint that guards reuse need their own pins.
  */
class IndexCacheSpec extends SparkSuite {

  test("fingerprint is stable across repeated computation") {
    // the digest must be a pure function of the dir contents — a
    // read-chunking-dependent hash would spuriously wipe valid
    // artifacts mid-run (r14 advice)
    val a = IndexCache.fingerprint(sf)
    val b = IndexCache.fingerprint(sf)
    assert(a == b && a.length == 32)
  }

  test("fingerprint sees content changes in head bytes") {
    val root = Files.createTempDirectory("icfp")
    val f = root.resolve("t.parquet")
    Files.write(f, Array.fill[Byte](1024)(1))
    val fp1 = IndexCache.fingerprint(root.toString)
    Files.write(f, Array.fill[Byte](1024)(2))
    val fp2 = IndexCache.fingerprint(root.toString)
    assert(fp1 != fp2)
  }

  test("fingerprint survives a >=2 GiB source file (length clamp)") {
    // a sparse file: 2.2e9 bytes of length, no disk cost. The old
    // math.min(w, len.toInt) wrapped negative here and
    // ByteBuffer.allocate threw, killing every cache lookup for the
    // dir (r14 advice).
    val root = Files.createTempDirectory("icbig")
    val f = root.resolve("big.parquet")
    val raf = new java.io.RandomAccessFile(f.toFile, "rw")
    try raf.setLength(2200000000L) finally raf.close()
    val fp = IndexCache.fingerprint(root.toString)
    assert(fp.length == 32)
    Files.delete(f); Files.delete(root)
  }

  test("cold miss rebuilds a persisted artifact; second call reuses " +
    "it (_SUCCESS present, no wipe)") {
    // copy the sf0.001 tables into a fresh dir -> new cache key with
    // no committed artifacts: the first indexed-query call must
    // BUILD, the second must find the artifact fresh. This is the
    // fresh-checkout path now that idxcache/ binaries are untracked.
    val tmp = Files.createTempDirectory("iccold")
    Seq("documents", "embeddings").foreach { t =>
      Files.copy(Paths.get(s"$sf/$t.parquet"),
        tmp.resolve(s"$t.parquet"))
    }
    val dir = tmp.toString
    assert(!IndexCache.wasFresh(dir),
      "a never-seen dir must not report a fresh cache")
    val r1 = graft.operators.Search.bm25IndexedQuery(spark, dir)
      .collect()
    assert(r1.nonEmpty)
    val art = IndexCache.dirFor(dir, "bm25idx2")
    assert(Files.exists(art.resolve("_SUCCESS")),
      s"indexed query did not persist its artifact under $art")
    val r2 = graft.operators.Search.bm25IndexedQuery(spark, dir)
      .collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
      "rebuild-vs-reuse changed the served result")
  }
}
