package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Small-sidecar-file IO through the Hadoop FileSystem API, so model /
  * curve JSON lands on the same filesystem as the parquet data it
  * describes (an `hdfs://`- or `s3a://`-backed index would silently
  * break with `java.nio` paths — or worse, read a stale local copy).
  */
object FsIo {

  private def conf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def writeString(path: String, s: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf())
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write via a sibling temp file + rename, so the destination only
    * ever holds a COMPLETE file (rename is atomic on HDFS and on local
    * filesystems; a crash mid-write leaves only the `.tmp`). Used for
    * files whose mere existence is a commit marker (model JSON that
    * marks a versioned index snapshot complete).
    */
  def writeStringAtomic(path: String, s: String): Unit = {
    val dst = new Path(path)
    val tmp = new Path(path + ".tmp")
    val fs = dst.getFileSystem(conf())
    val out = fs.create(tmp, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"atomic rename $tmp -> $dst failed")
  }

  def readString(path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf())
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  def exists(path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf()).exists(p)
  }

  def delete(path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf())
    if (fs.exists(p)) fs.delete(p, true)
  }
}
