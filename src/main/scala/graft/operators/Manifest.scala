package graft.operators

import org.apache.spark.sql.SparkSession

/** Versioned index roots — the publish/resolve/GC contract shared by
  * every persisted index in the engine (IVF cell layouts, BM25
  * postings): `root/v<N>/` version directories with `v<N>_*` sidecar
  * directories, and a `root/_current` pointer flipped by an atomic
  * rename. The reference's analog is the `lastSnapshotID` pointer
  * persisted in snapshots_MaxLogID
  * (/root/reference/src/persistence.cc:156-158): readers always
  * resolve the live artifact through one small pointer, so a rebuild
  * publishes atomically and a crash before the flip leaves the old
  * version live.
  */
object Manifest {

  private def currentPtr(root: String) =
    new org.apache.hadoop.fs.Path(root, "_current")

  /** Atomically publish `version` (a directory name under `root`) as
    * live: write the pointer to a sibling temp file, then rename OVER
    * `_current` (FileContext rename with OVERWRITE — the single
    * atomic primitive on both HDFS and POSIX). A concurrent reader
    * sees the old pointer or the new one, never a torn write.
    */
  def publish(s: SparkSession, root: String, version: String): Unit = {
    val conf = s.sessionState.newHadoopConf()
    val ptr = currentPtr(root)
    val fs = ptr.getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root))
    val tmp = new org.apache.hadoop.fs.Path(root, "_current.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(ptr.toUri, conf)
    fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The live version name under `root`; None before the first
    * publish (or after a crash that never reached one — readers then
    * have nothing to serve, which is the correct failure).
    */
  def current(s: SparkSession, root: String): Option[String] = {
    val conf = s.sessionState.newHadoopConf()
    val ptr = currentPtr(root)
    val fs = ptr.getFileSystem(conf)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        Some(new String(buf.toByteArray, "UTF-8").trim)
      } finally in.close()
    }
  }

  /** Absolute path of the live version under `root`. */
  def resolve(s: SparkSession, root: String): String =
    current(s, root)
      .map(v => new org.apache.hadoop.fs.Path(root, v).toString)
      .getOrElse(throw new IllegalStateException(
        s"no published index under $root"))

  def nextVersion(s: SparkSession, root: String): String =
    "v" + (current(s, root).map(_.stripPrefix("v").toLong)
      .getOrElse(0L) + 1)

  /** Retention for superseded versions: keep the live version
    * (always) plus the `keep` highest-numbered versions; delete the
    * rest with their `v<N>_*` sidecar directories. The pointer is
    * read FIRST, so the live index is never deleted even if a
    * publish races this; a crash mid-GC leaves garbage the next run
    * removes — idempotent. Returns the deleted directory names.
    */
  def gcVersions(s: SparkSession, root: String,
                 keep: Int = 1): Seq[String] = {
    val conf = s.sessionState.newHadoopConf()
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    current(s, root) match {
      case None => Seq.empty // nothing published — nothing is garbage yet
      case Some(live) =>
        val dirs = fs.listStatus(rootPath).toSeq
          .filter(_.isDirectory).map(_.getPath.getName)
        val versions = dirs.filter(_.matches("v\\d+"))
          .sortBy(-_.stripPrefix("v").toLong)
        val retain = (versions.take(keep) :+ live).toSet
        val doomed = versions.filterNot(retain)
        doomed.flatMap { v =>
          val victims = dirs.filter(d => d == v || d.startsWith(v + "_"))
          victims.foreach { d =>
            fs.delete(new org.apache.hadoop.fs.Path(rootPath, d), true)
          }
          victims
        }
    }
  }
}
