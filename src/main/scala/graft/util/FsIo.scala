package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Small-sidecar-file IO through the Hadoop FileSystem API, so model /
  * curve JSON lands on the same filesystem as the parquet data it
  * describes (an `hdfs://`- or `s3a://`-backed index would silently
  * break with `java.nio` paths — or worse, read a stale local copy).
  *
  * Local (`file://` / schemeless) paths short-circuit to `java.nio`:
  * Hadoop's LocalFileSystem is a ChecksumFileSystem that shadows every
  * file with a `.name.crc` sidecar, and an ATOMIC pointer swap through
  * the raw layer would leave the old crc beside the new content —
  * concurrent readers then fail with ChecksumException (observed in
  * the Round16 pointer-hammer test). nio gives a true atomic
  * `Files.move(..., ATOMIC_MOVE)` and hard-link CAS with no checksum
  * sidecars to go stale. Remote schemes (HDFS) keep their checksums
  * server-side, so the Hadoop path there has no such hazard.
  */
object FsIo {

  private def conf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** nio path when the URI is local (no scheme or `file:`). */
  private def localOf(path: String): Option[java.nio.file.Path] = {
    val uri = new Path(path).toUri
    if (uri.getScheme == null || uri.getScheme == "file")
      Some(java.nio.file.Paths.get(uri.getPath))
    else None
  }

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  def writeString(path: String, s: String): Unit = localOf(path) match {
    case Some(p) =>
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, s.getBytes(Utf8))
      dropCrc(p) // a pre-nio writer may have left a checksum sidecar
    case None =>
      val p = new Path(path)
      val fs = p.getFileSystem(conf())
      val out = fs.create(p, true)
      try out.write(s.getBytes(Utf8))
      finally out.close()
  }

  /** Write via a writer-unique temp file + OVERWRITING atomic rename,
    * so the destination only ever holds a COMPLETE file AND never
    * stops existing (the previous delete-then-rename form had a window
    * where a reader of a commit pointer racing a writer took its "no
    * pointer" fallback mid-commit — the torn read ADVICE r10 flagged).
    * Used for files whose mere existence is a commit marker (model
    * JSON that marks a versioned index snapshot complete) and for
    * swap-in-place pointers (`_files.json`, `_manifest.json`).
    */
  def writeStringAtomic(path: String, s: String): Unit = localOf(path) match {
    case Some(dst) =>
      if (dst.getParent != null)
        java.nio.file.Files.createDirectories(dst.getParent)
      val tmp = dst.resolveSibling(
        dst.getFileName.toString + ".tmp." + java.util.UUID.randomUUID())
      java.nio.file.Files.write(tmp, s.getBytes(Utf8))
      dropCrc(dst)
      java.nio.file.Files.move(tmp, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    case None =>
      val dst = new Path(path)
      val tmp = new Path(path + ".tmp." + java.util.UUID.randomUUID())
      val fs = dst.getFileSystem(conf())
      val out = fs.create(tmp, true)
      try out.write(s.getBytes(Utf8))
      finally out.close()
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          dst.toUri, conf())
        fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // FS with no AbstractFileSystem binding: non-atomic fallback
          // (documented residual window; no supported scheme hits this)
          if (fs.exists(dst)) fs.delete(dst, false)
          if (!fs.rename(tmp, dst))
            throw new java.io.IOException(s"atomic rename $tmp -> $dst failed")
      }
  }

  /** Exclusive-create (compare-and-swap) write: atomically create
    * `path` with the full content IFF it does not already exist.
    * Returns true on success, false if some other writer created it
    * first — the primitive a multi-writer commit log needs (the loser
    * of the race re-reads and retries or fails loudly, never silently
    * overwrites the winner).
    *
    * Local paths get a true POSIX CAS: the content is written to a
    * writer-unique temp file and published with `Files.createLink`
    * (hard link), which is atomic and fails with
    * `FileAlreadyExistsException` — a concurrent reader can never
    * observe a half-written destination. Other filesystems mirror the
    * same shape: write a writer-unique temp file, then publish with a
    * NO-overwrite `FileContext.rename` (namenode-atomic on HDFS, fails
    * with FileAlreadyExistsException when the loser arrives second).
    * The earlier `fs.create(path, overwrite=false)` form claimed the
    * NAME atomically but streamed content afterwards — a reader
    * resolving the newest version file could observe it empty/partial
    * (the torn-read window ADVICE r11 flagged); rename-publish closes
    * it because the destination only ever appears fully written.
    */
  def writeStringExclusive(path: String, s: String): Boolean =
    localOf(path) match {
      case Some(dst) =>
        if (dst.getParent != null)
          java.nio.file.Files.createDirectories(dst.getParent)
        val tmp = dst.resolveSibling(
          dst.getFileName.toString + ".tmp." + java.util.UUID.randomUUID())
        java.nio.file.Files.write(tmp, s.getBytes(Utf8))
        try {
          java.nio.file.Files.createLink(dst, tmp)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        } finally java.nio.file.Files.deleteIfExists(tmp)
      case None =>
        val dst = new Path(path)
        val fs = dst.getFileSystem(conf())
        if (fs.exists(dst)) return false // cheap fast-path, not the CAS
        val tmp = new Path(path + ".tmp." + java.util.UUID.randomUUID())
        val out = fs.create(tmp, true)
        try out.write(s.getBytes(Utf8))
        finally out.close()
        try {
          // Rename.NONE = fail (atomically, server-side) if dst exists
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            dst.toUri, conf())
          fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.NONE)
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.FileNotFoundException => false
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            // FS with no AbstractFileSystem binding: FileSystem.rename
            // refuses an existing destination too (non-atomically on
            // exotic schemes; documented residual, nothing supported
            // hits this)
            fs.rename(tmp, dst)
        } finally {
          if (fs.exists(tmp)) fs.delete(tmp, false)
        }
    }

  /** Sidecar reads performed by [[readString]] — test telemetry for
    * the log's bounded-materialization claim (a cold [[graft.store
    * .FileLog.read]] touches at most checkpoint-interval records),
    * harmless in production.
    */
  private[graft] val reads = new java.util.concurrent.atomic.AtomicLong(0L)

  def readString(path: String): String = { reads.incrementAndGet(); localOf(path) } match {
    case Some(p) =>
      try new String(java.nio.file.Files.readAllBytes(p), Utf8)
      catch { // keep the Hadoop-path exception type for callers
        case e: java.nio.file.NoSuchFileException =>
          throw new java.io.FileNotFoundException(e.getFile)
      }
    case None =>
      val p = new Path(path)
      val fs = p.getFileSystem(conf())
      val in = fs.open(p)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, Utf8)
      } finally in.close()
  }

  def exists(path: String): Boolean = localOf(path) match {
    case Some(p) => java.nio.file.Files.exists(p)
    case None =>
      val p = new Path(path)
      p.getFileSystem(conf()).exists(p)
  }

  def delete(path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf())
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Remove the Hadoop ChecksumFileSystem crc sidecar of a LOCAL file,
    * if an earlier Hadoop-path write left one: after a nio write the
    * content no longer matches it, and a Hadoop-path reader would fail
    * verification against the stale sums.
    */
  private def dropCrc(p: java.nio.file.Path): Unit = {
    val crc = p.resolveSibling("." + p.getFileName.toString + ".crc")
    java.nio.file.Files.deleteIfExists(crc)
  }
}
