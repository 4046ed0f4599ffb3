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
    val newEntries = fresh.map { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        var rows = 0L
        val lo = scala.collection.mutable.Map.empty[String, Long]
        val hi = scala.collection.mutable.Map.empty[String, Long]
        reader.getFooter.getBlocks.forEach { b =>
          rows += b.getRowCount
          b.getColumns.forEach { c =>
            val name = c.getPath.toDotString
            if (cols.contains(name)) c.getStatistics match {
              case s: LongStatistics if s.hasNonNullValue =>
                lo.update(name, math.min(lo.getOrElse(name, Long.MaxValue), s.getMin))
                hi.update(name, math.max(hi.getOrElse(name, Long.MinValue), s.getMax))
              case _ => ()
            }
          }
        }
        FileZones(p.toString, rows, lo.keys.map(k => k -> (lo(k), hi(k))).toMap)
      } finally reader.close()
    }
    val merged = (if (known.isEmpty) Seq.empty else loadManifest(dir)) ++
      newEntries
    writeManifest(dir, merged)
    fresh.length
  }

  private def writeManifest(dir: String, entries: Seq[FileZones]): Unit = {
    val json = Json.write(entries.map(e => Map(
      "path" -> e.path,
      "rows" -> e.rows.toDouble,
      "zones" -> e.zones.map { case (k, (l, h)) =>
        k -> Vector(l.toDouble, h.toDouble) })).toVector)
    FsIo.writeStringAtomic(manifestPath(dir), json)
  }

  /** Parse `_manifest.json` back into file entries. */
  def loadManifest(dir: String): Seq[FileZones] =
    Json.parse(FsIo.readString(manifestPath(dir))) match {
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
      ranges: Map[String, (Long, Long)]): (DataFrame, Int, Int) = {
    val entries = loadManifest(dir)
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
}
