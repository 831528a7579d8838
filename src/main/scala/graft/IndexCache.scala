package graft

import java.nio.file.{Files, Path, Paths}

/** PERSISTENT ARTIFACT ROOT (r14, VERDICT r13 #1) — one place that
  * answers "where does a dir-keyed persisted structure live, and is
  * what's there still valid?".
  *
  * Why it exists: the bench's untimed prebuild phase re-built every
  * persisted index from scratch whenever `target/` was fresh — on
  * the r13 driver host that cost 155.7s of the 900s budget (vs 47.3s
  * on a warm builder workspace) and starved the second timed pass to
  * 146/375 queries. The artifacts are DETERMINISTIC functions of
  * (source dir contents, layout version), so they are reusable
  * across runs, rounds, and checkouts: this object roots them at
  * `idxcache/` (outside `target/`, so `sbt clean` keeps them, and
  * the repo commits the three testdata-SF keys — a fresh checkout
  * starts with every prebuild artifact already `_SUCCESS`-present).
  *
  * Safety: reuse is gated by a SOURCE FINGERPRINT, checked once per
  * (JVM, dir). `srcfp-<key>` records FORMAT plus, per parquet file
  * under the source dir: name, length, and md5 of the first and
  * last 64 KiB. If the recorded fingerprint differs from the
  * recomputed one (testdata regenerated, layout version bumped),
  * every `*-<key>*` artifact is wiped before any path is handed
  * out — a stale committed index can never serve a query.
  *
  * FORMAT discipline: bump [[FORMAT]] whenever ANY persisted
  * artifact's layout or build semantics change. Per-structure
  * version tags in the artifact NAME (bm25idx2, spellidx2, v3
  * replicas) remain the right tool for single-structure changes;
  * FORMAT is the blunt instrument for cross-cutting ones.
  */
object IndexCache {

  /** Global layout version folded into every fingerprint. */
  val FORMAT = 1

  private val root = Paths.get("idxcache").toAbsolutePath

  /** Hex key for a source dir — the historical `dir.hashCode`
    * convention every artifact name already uses.
    */
  def key(dir: String): String =
    java.lang.Integer.toHexString(dir.hashCode)

  private val validated =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Whether `dir`'s artifacts were ALREADY fingerprint-fresh when
    * this JVM first looked (i.e. a prior run — or the committed
    * cache — built them from identical sources under the current
    * FORMAT). The bench uses this to skip its untimed prebuild
    * phase wholesale: artifacts that exist and are fresh serve the
    * timed passes directly, and in-memory memo warming is pass 1's
    * job under the min-of-two discipline.
    */
  def wasFresh(dir: String): Boolean = {
    ensureFresh(dir)
    validated.get(dir)
  }

  /** Path of the artifact `<name>-<key(dir)>`, fingerprint-validated.
    * All persisted dir-keyed structures MUST come through here (or
    * [[pathTagged]]) so the freshness guard sees every consumer.
    */
  def dirFor(dir: String, name: String): Path = {
    ensureFresh(dir)
    root.resolve(s"$name-${key(dir)}")
  }

  /** Variant for artifacts that append a suffix to the keyed name
    * (the bm25 `_stats`/`_terms` sidecars).
    */
  def dirForTagged(dir: String, name: String, tag: String): Path = {
    ensureFresh(dir)
    root.resolve(s"$name-${key(dir)}$tag")
  }

  /** Validate (once per JVM per dir) that the artifacts keyed by
    * `dir` were built from the dir's CURRENT contents under the
    * CURRENT FORMAT; wipe them all if not. Synchronized coarsely —
    * validation is one small-file read in the steady state.
    */
  private def ensureFresh(dir: String): Unit = {
    if (validated.containsKey(dir)) return
    synchronized {
      if (validated.containsKey(dir)) return
      val k = key(dir)
      val fp = fingerprint(dir)
      val marker = root.resolve(s"srcfp-$k")
      val recorded =
        if (Files.isRegularFile(marker)) Files.readString(marker).trim
        else ""
      if (recorded != fp) {
        if (Files.isDirectory(root)) {
          listDir(root).foreach { p =>
            val n = p.getFileName.toString
            // exactly this key: `name-<key>` or `name-<key>_tag`
            if (n.endsWith(s"-$k") || n.contains(s"-${k}_"))
              deleteRecursively(p)
          }
        }
        Files.createDirectories(root)
        Files.writeString(marker, fp + "\n")
      }
      validated.put(dir, recorded == fp)
    }
  }

  /** md5 over (FORMAT, each parquet file's name/length/head/tail
    * 64 KiB) — cheap (a few small reads) and strong enough that a
    * regenerated testdata vintage cannot silently reuse artifacts:
    * parquet packs row-group stats in the tail and data in the head,
    * so any content change perturbs one of the hashed windows.
    */
  private[graft] def fingerprint(dir: String): String = {
    val d = Paths.get(dir)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"format=$FORMAT;".getBytes("UTF-8"))
    if (Files.isDirectory(d)) {
      val entries = listDir(d)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.getFileName.toString)
      entries.foreach { p =>
        // a table may be a single file or a parquet DIRECTORY of
        // part files — hash the parts in name order either way
        val parts =
          if (Files.isDirectory(p))
            listDir(p).filter { q =>
              val n = q.getFileName.toString
              !n.startsWith(".") && !n.startsWith("_")
            }.sortBy(_.getFileName.toString)
          else Seq(p)
        parts.foreach { q =>
          val len = Files.size(q)
          md.update(s"${p.getFileName}/${q.getFileName}:$len;"
            .getBytes("UTF-8"))
          val ch = java.nio.channels.FileChannel.open(q)
          try {
            val w = 65536L
            // clamp BEFORE narrowing: len.toInt on a >=2 GiB file
            // wraps negative and allocate() throws
            md.update(readFully(ch, 0L, math.min(w, len).toInt))
            if (len > w) md.update(readFully(ch, len - w, w.toInt))
          } finally ch.close()
        }
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Read exactly `want` bytes at `pos` (or to EOF): a single
    * FileChannel.read may return short, which would make the digest
    * depend on kernel read chunking — a spurious hash change wipes
    * valid (committed) artifacts and re-triggers builds inside timed
    * bench passes.
    */
  private def readFully(ch: java.nio.channels.FileChannel,
                        pos: Long, want: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(want)
    var off = pos
    var n = 0
    while (buf.hasRemaining && n >= 0) {
      n = ch.read(buf, off)
      if (n > 0) off += n
    }
    if (buf.position() == want) buf.array()
    else java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  /** Files.list with the stream CLOSED (each unclosed stream leaks a
    * directory fd; a full test+bench run touches many dir keys).
    */
  private def listDir(p: Path): Seq[Path] = {
    val st = Files.list(p)
    try {
      val it = st.iterator()
      val b = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) b += it.next()
      b.toSeq
    } finally st.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
