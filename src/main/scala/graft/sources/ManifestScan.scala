package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.LongStatistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.server.Json
import graft.util.FsIo

/** File-level data skipping via a stats manifest — the Iceberg/Delta
  * idea re-expressed over plain parquet directories.
  *
  * Spark's parquet reader already prunes ROW GROUPS from pushed
  * filters, but only after it has listed the directory and opened
  * every file's footer: at 100 TB / millions of files, task scheduling
  * and footer I/O dominate a selective scan. A manifest — one small
  * JSON sidecar holding per-file zone maps (min/max per indexed
  * column) — moves that pruning to PLANNING time: the driver reads one
  * file, intersects each file's zones with the query's ranges, and
  * hands Spark only the surviving file list. Combined with a
  * range-clustered write (each file owns a tight key range, the x21
  * Z-order idea one level up), a point/range query schedules tasks for
  * a handful of files no matter how large the table is.
  *
  * The manifest is built from parquet FOOTERS only (`ParquetFileReader`
  * metadata reads — no data pages touched): production writers get
  * these for free at commit time, exactly how Delta/Iceberg populate
  * their manifests. Zone maps cover INT64 columns (ids, bucketed
  * timestamps — the clustering keys); other types pass through
  * unpruned, handled by the residual filter. Pruning is always
  * conservative: a file is skipped only when a queried range is
  * PROVABLY disjoint from the file's zone, files lacking stats are
  * kept, and the full predicate is re-applied to survivors (so Spark's
  * own row-group pruning and codegen'd filters still run — the
  * manifest only shrinks the file list, never changes semantics).
  *
  * Reference tie-in: the reference shards vectors into per-bucket
  * files and routes queries to matching buckets
  * (`sharding/lsh_sharding.py`, `coordinator/coordinator.py`) — the
  * same skip-what-can't-match contract, here generalized to arbitrary
  * range predicates over relational keys.
  */
object ManifestScan {

  /** Per-file entry: row count + [min,max] zone per indexed column. */
  final case class FileZones(path: String, rows: Long,
      zones: Map[String, (Long, Long)])

  def manifestPath(dir: String): String = s"$dir/_manifest.json"

  private def versionPath(dir: String, v: Int): String =
    s"$dir/_manifest.v$v.json"

  /** Retained manifest versions, ascending. Every manifest write also
    * snapshots itself as `_manifest.v{N}.json`, so any retained
    * version's exact FILE SET is re-readable forever — a pinned
    * training run re-reads the bytes it trained on even after later
    * appends and compactions rewrote the current layout (the
    * Delta/Iceberg time-travel contract, at sidecar scale).
    */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val re = """_manifest\.v(\d+)\.json""".r
    val st = fs.listStatus(new Path(dir))
    st.map(_.getPath.getName).collect { case re(n) => n.toInt }.sorted.toSeq
  }

  /** Build `_manifest.json` for every parquet file under `dir`,
    * collecting INT64 min/max zones for `cols` from file footers
    * (metadata-only I/O). Returns the number of files indexed.
    *
    * Footer reads are driver-side here; at manifest-build scale they
    * distribute trivially (a job over the file list), and a production
    * writer collects the same stats at write time without any read.
    */
  def buildManifest(spark: SparkSession, dir: String, cols: Seq[String]): Int = {
    if (FsIo.exists(manifestPath(dir))) FsIo.delete(manifestPath(dir))
    refreshManifest(spark, dir, cols)
  }

  /** Incremental manifest maintenance for APPEND-style writers
    * (streaming ingest, micro-batch sinks): footer-read only the data
    * files NOT yet in the manifest, merge, and atomically rewrite.
    * Returns the number of newly indexed files. Cost is proportional
    * to the APPENDED files, never the table — the property that keeps
    * a streaming sink's per-batch overhead flat as the table grows.
    * (Concurrent writers would need a log, not a sidecar — single
    *-writer appenders only, the Structured Streaming sink model.)
    */
  def refreshManifest(spark: SparkSession, dir: String,
      cols: Seq[String]): Int = {
    val known: Set[String] =
      if (FsIo.exists(manifestPath(dir))) loadManifest(dir).map(_.path).toSet
      else Set.empty
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    val fresh = fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .filter(p => !known.contains(p.toString))
      .sortBy(_.getName)
    if (fresh.isEmpty) return 0
    val merged = (if (known.isEmpty) Seq.empty else loadManifest(dir)) ++
      statsOf(spark, fresh.toSeq, cols)
    writeManifest(spark, dir, merged)
    fresh.length
  }

  /** Footer-only stats collection for a batch of parquet files:
    * row counts + INT64 min/max zones for `cols`. Metadata I/O only —
    * no data pages are read. `private[graft]`: [[graft.store.FileLog]]
    * reuses it to record zones in index commits.
    */
  private[graft] def statsOf(spark: SparkSession, paths: Seq[Path],
      cols: Seq[String]): Seq[FileZones] = {
    val conf = spark.sessionState.newHadoopConf()
    paths.map { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        var rows = 0L
        var blocks = 0L
        val lo = scala.collection.mutable.Map.empty[String, Long]
        val hi = scala.collection.mutable.Map.empty[String, Long]
        val covered = scala.collection.mutable.Map.empty[String, Long]
        reader.getFooter.getBlocks.forEach { b =>
          rows += b.getRowCount
          blocks += 1
          b.getColumns.forEach { c =>
            val name = c.getPath.toDotString
            if (cols.contains(name)) c.getStatistics match {
              case s: LongStatistics if s.hasNonNullValue =>
                lo.update(name, math.min(lo.getOrElse(name, Long.MaxValue), s.getMin))
                hi.update(name, math.max(hi.getOrElse(name, Long.MinValue), s.getMax))
                covered.update(name, covered.getOrElse(name, 0L) + 1)
              case _ => ()
            }
          }
        }
        // A zone is recorded only when EVERY block carries usable stats
        // for the column: parquet can't distinguish "stats not written"
        // from "all null", so a zone built from a subset of blocks
        // would exclude the uncovered blocks' rows and let readPruned
        // skip a file that actually matches — silent row loss (r10
        // ADVICE fix). Unzoned columns keep the file unconditionally.
        FileZones(p.toString, rows,
          lo.keys.filter(k => covered(k) == blocks)
            .map(k => k -> (lo(k), hi(k))).toMap)
      } finally reader.close()
    }
  }

  /** Commit a new manifest: snapshot it as the next `_manifest.v{N}`
    * (immutable history), then atomically swap `_manifest.json` (the
    * current pointer readers use). Crash between the two writes leaves
    * an orphan version file and an unchanged current — never a torn
    * table.
    */
  private def writeManifest(spark: SparkSession, dir: String,
      entries: Seq[FileZones]): Unit = {
    val json = Json.write(entries.map(e => Map(
      "path" -> e.path,
      "rows" -> e.rows.toDouble,
      "zones" -> e.zones.map { case (k, (l, h)) =>
        k -> Vector(l.toDouble, h.toDouble) })).toVector)
    val next = versions(spark, dir).lastOption.getOrElse(0) + 1
    FsIo.writeStringAtomic(versionPath(dir, next), json)
    FsIo.writeStringAtomic(manifestPath(dir), json)
  }

  /** Parse a historical `_manifest.v{N}.json` back into file entries. */
  def loadManifestVersion(dir: String, v: Int): Seq[FileZones] =
    parseManifest(FsIo.readString(versionPath(dir, v)))

  /** Parse `_manifest.json` back into file entries. */
  def loadManifest(dir: String): Seq[FileZones] =
    parseManifest(FsIo.readString(manifestPath(dir)))

  private def parseManifest(text: String): Seq[FileZones] =
    Json.parse(text) match {
      case v: Vector[_] => v.map { e =>
        val m = e.asInstanceOf[Map[String, Any]]
        FileZones(
          m("path").asInstanceOf[String],
          m("rows").asInstanceOf[Double].toLong,
          m("zones").asInstanceOf[Map[String, Any]].map { case (k, z) =>
            val zz = z.asInstanceOf[Vector[Any]]
            k -> (zz(0).asInstanceOf[Double].toLong,
              zz(1).asInstanceOf[Double].toLong)
          })
      }
      case other => sys.error(s"bad manifest: $other")
    }

  /** Manifest-pruned scan: keep only files whose zones INTERSECT every
    * queried `[lo, hi]` range (missing zones keep the file), apply the
    * full predicate as a residual filter, and return
    * (dataframe, filesKept, filesTotal).
    */
  def readPruned(spark: SparkSession, dir: String,
      ranges: Map[String, (Long, Long)]): (DataFrame, Int, Int) =
    readEntries(spark, dir, loadManifest(dir), ranges)

  /** Time-travel read: the same pruned scan against a RETAINED
    * historical version's file set — after later appends and
    * compactions, version `v` still reads exactly the rows it
    * described when it was committed (until [[vacuum]] drops it).
    */
  def readPrunedAsOf(spark: SparkSession, dir: String, v: Int,
      ranges: Map[String, (Long, Long)]): (DataFrame, Int, Int) =
    readEntries(spark, dir, loadManifestVersion(dir, v), ranges)

  private def readEntries(spark: SparkSession, dir: String,
      entries: Seq[FileZones],
      ranges: Map[String, (Long, Long)]): (DataFrame, Int, Int) = {
    val kept = entries.filter { e =>
      ranges.forall { case (c, (qlo, qhi)) =>
        e.zones.get(c).forall { case (flo, fhi) => qhi >= flo && qlo <= fhi }
      }
    }
    val base =
      if (kept.isEmpty) // provably empty result; keep the schema
        spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(kept.map(_.path): _*)
    val filtered = ranges.foldLeft(base) { case (df, (c, (qlo, qhi))) =>
      df.where(col(c).between(qlo, qhi))
    }
    (filtered, kept.size, entries.size)
  }

  /** Compact the CURRENT file set into ~`targetFiles` range-clustered
    * files and commit a new manifest version referencing only them —
    * the maintenance pass that pays down an appending sink's
    * small-files debt (s26 writes a few files per micro-batch; a
    * million micro-batches later a selective read would open a
    * million footers without this). Old files stay on disk so retained
    * versions keep reading their exact snapshot; [[vacuum]] reclaims
    * them. After the first compaction the manifest IS the table —
    * a plain directory listing sees old+new generations, exactly the
    * log-structured-table contract (same as Delta/Iceberg dirs).
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String, clusterCol: String,
      targetFiles: Int, cols: Seq[String]): (Int, Int) = {
    val cur = loadManifest(dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    def dataFiles(): Set[String] = fs.listStatus(new Path(dir))
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .map(_.toString).toSet
    val before = dataFiles()
    spark.read.parquet(cur.map(_.path): _*)
      .repartitionByRange(targetFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("append").parquet(dir)
    val fresh = (dataFiles() -- before).toSeq.sorted
    writeManifest(spark, dir, statsOf(spark, fresh.map(new Path(_)), cols))
    (cur.size, fresh.size)
  }

  /** Drop history: retain the newest `retainLast` manifest versions
    * (the current pointer always survives), delete older version
    * files, then delete every data file no retained version
    * references. Referenced-file safety is set arithmetic, not
    * timestamps — a file is deleted only when provably unreachable
    * from every surviving manifest. Returns the number of data files
    * deleted.
    */
  def vacuum(spark: SparkSession, dir: String, retainLast: Int): Int = {
    require(retainLast >= 1, "must retain at least the current version")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - retainLast))
    val referenced = (keep.flatMap(v => loadManifestVersion(dir, v)) ++
      loadManifest(dir)).map(_.path).toSet
    drop.foreach(v => FsIo.delete(versionPath(dir, v)))
    val orphans = fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .filter(p => !referenced.contains(p.toString))
    orphans.foreach(p => fs.delete(p, false))
    orphans.length
  }
}
