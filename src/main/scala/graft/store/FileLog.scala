package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.server.Json
import graft.util.FsIo

/** Versioned file log for the vector-store layouts — the commit layer
  * that makes raw-parquet index reads SNAPSHOT-ISOLATED.
  *
  * The round-12 concurrent-mutation battery documented (and tolerated)
  * the raw-parquet gap: dynamic partition overwrite replaces a
  * partition's files non-atomically, so a reader listing the directory
  * mid-commit either throws FileNotFound (retried) or — worse, and
  * caught intermittently by the battery — succeeds against a
  * half-replaced partition and silently under-counts. A table format
  * closes that gap, and this is its minimal core, the same shape as
  * [[graft.sources.ManifestScan]]'s versioned sidecar: the index's
  * live file SET lives in `_files.json`, every commit also snapshots
  * an immutable `_files.v{N}.json`, and mutations only ever APPEND
  * data files and swap the log atomically (tmp+rename). Readers
  * resolve the log once per scan and read an immutable file list —
  * they see the pre-commit or post-commit table, never a torn one;
  * replaced files stay on disk until [[vacuum]], so an in-flight
  * reader's list stays valid (a reader can only lose the race to
  * vacuum itself, which surfaces as the retryable FileNotFound, never
  * as silent row loss).
  *
  * The log also records the index schema (DDL), so an EMPTY index —
  * a store created by a streaming sink before its first batch, or
  * fully deleted — reads back with its real schema instead of failing
  * parquet inference on a fileless directory.
  *
  * Single-writer, like the reference's ingest path and Structured
  * Streaming's sink model; concurrent WRITERS would need a lock or a
  * compare-and-swap log append (the full table-format problem).
  */
object FileLog {

  final case class State(files: Seq[String], schemaDdl: String)

  def currentPath(dir: String): String = s"$dir/_files.json"
  private def versionPath(dir: String, v: Int): String = s"$dir/_files.v$v.json"

  def exists(dir: String): Boolean = FsIo.exists(currentPath(dir))

  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Seq.empty
    val re = """_files\.v(\d+)\.json""".r
    fs.listStatus(p).map(_.getPath.getName)
      .collect { case re(n) => n.toInt }.sorted.toSeq
  }

  def read(dir: String): State = parse(FsIo.readString(currentPath(dir)))

  def readVersion(dir: String, v: Int): State =
    parse(FsIo.readString(versionPath(dir, v)))

  private def parse(text: String): State = {
    val m = Json.parse(text).asInstanceOf[Map[String, Any]]
    State(m("files").asInstanceOf[Vector[Any]].map(_.asInstanceOf[String]),
      m("schema").asInstanceOf[String])
  }

  /** Commit a new live file set: snapshot as the next version, then
    * atomically swap the current pointer. Returns the version number.
    */
  def commit(spark: SparkSession, dir: String, files: Seq[String],
             schemaDdl: String): Int = {
    val json = Json.write(Map(
      "schema" -> schemaDdl, "files" -> files.sorted.toVector))
    val next = versions(spark, dir).lastOption.getOrElse(0) + 1
    FsIo.writeStringAtomic(versionPath(dir, next), json)
    FsIo.writeStringAtomic(currentPath(dir), json)
    next
  }

  /** Every parquet data file physically under `dir` (recursive —
    * partitioned layouts nest bucket/table directories), whether or
    * not the log references it.
    */
  def listDataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Seq.empty
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        out += f.toString
    }
    out.result().sorted
  }

  /** Drop history: retain the newest `retainLast` version logs, delete
    * older ones, then delete every data file no surviving log (or the
    * current pointer) references — set arithmetic, never timestamps.
    * Returns the number of data files deleted.
    */
  def vacuum(spark: SparkSession, dir: String, retainLast: Int): Int = {
    require(retainLast >= 1, "must retain at least the current version")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - retainLast))
    val referenced = (keep.flatMap(v => readVersion(dir, v).files) ++
      read(dir).files).toSet
    drop.foreach(v => FsIo.delete(versionPath(dir, v)))
    val orphans = listDataFiles(spark, dir).filterNot(referenced.contains)
    orphans.foreach(f => fs.delete(new Path(f), false))
    orphans.length
  }
}
