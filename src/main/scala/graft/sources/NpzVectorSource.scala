package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataOutputStream, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.JavaConverters._
import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Hadoop Configuration is not Serializable; DSv2 reader/writer
  * factories are shipped to executors, so snapshot the conf as plain
  * key/value pairs at plan time and rebuild lazily on the executor.
  * (Public-API alternative to Spark's private SerializableConfiguration.)
  */
final class HadoopConfSnapshot(entries: Array[(String, String)]) extends Serializable {
  @transient lazy val conf: Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

object HadoopConfSnapshot {
  def capture(c: Configuration): HadoopConfSnapshot =
    new HadoopConfSnapshot(c.iterator().asScala.map(e => e.getKey -> e.getValue).toArray)
}

/** DataSource V2 connector for the reference's true at-rest format:
  * NumPy NPZ shards — a zip holding `embeddings.npy` (n×d float32) and
  * `image_ids.npy` (n int64), exactly what
  * `generate_coco_embeddings.py:87-91` persists and
  * `load_coco_embeddings.py:17-22` re-reads. A user of the reference
  * can point this source at their existing NPZ files unchanged:
  *
  *   spark.read.format("npz").load(dir)          // id BIGINT, vector ARRAY<FLOAT>
  *   df.write.format("npz").mode("append").save(dir)
  *
  * Scale posture:
  *  - parallelism is per file AND within files: STORED zip entries
  *    (numpy `savez`, and everything this sink writes) are raw byte
  *    ranges, so batch planning row-splits them by seek offset under
  *    `spark.sql.files.maxPartitionBytes` (ZipIndex reads the central
  *    directory, zip64 included) — one huge shard file fans out
  *    across tasks exactly like a parquet file. DEFLATE entries
  *    (`savez_compressed`) cannot be random-accessed and fall back to
  *    one partition per file.
  *  - column pruning is pushed into the scan: a query touching only
  *    `id` streams the 8-byte/row ids entry and never opens the d×4
  *    bytes/row vectors entry (asserted in NpzSourceSpec against a file
  *    with a deliberately truncated vectors entry). An empty projection
  *    (count(*)) reads only the ids NPY header.
  *  - the reader streams: O(d) per-row buffer for vectors plus the ids
  *    array (8 bytes/row of one file) — no whole-entry materialization.
  *  - the writer buffers vector bytes in a task-local scratch file (the
  *    NPY header needs the row count up front and zip streams cannot
  *    seek back), so task memory stays O(d); each task commits one
  *    `part-<partition>-<task>.npz` via write-to-hidden-tmp + rename.
  *
  * Accepted dtypes: vectors `<f4`/`<f8` (doubles narrowed to float),
  * ids `<i8`/`<i4`. Entry names are options `vectorsEntry`/`idsEntry`
  * (defaults match the reference).
  */
class NpzVectorSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "npz"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NpzVectorSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new NpzTable(new CaseInsensitiveStringMap(properties))
}

object NpzVectorSource {
  val DefaultVectorsEntry = "embeddings.npy"
  val DefaultIdsEntry = "image_ids.npy"

  // Nullable-typed for append-resolution friendliness (parquet-sourced
  // frames carry nullable columns); the reader never emits nulls and
  // the writer rejects them.
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("vector", ArrayType(FloatType, containsNull = true), nullable = true)))

  /** Resolve the path option to concrete shard files: glob, then
    * expand directories one level (the write layout), taking *.npz
    * and skipping hidden/metadata files. Driver-side, one listing —
    * the streaming source calls this once per trigger (the same
    * O(files) cadence as Spark's own FileStreamSource).
    */
  def listFiles(conf: Configuration, pathStr: String): Seq[String] = {
    val p = new Path(pathStr)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    def visible(name: String): Boolean =
      !name.startsWith(".") && !name.startsWith("_")
    matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".npz") &&
            visible(f.getPath.getName))
      else
        // glob matches keep any extension the user asked for, but
        // hidden/in-flight files (Hadoop '*' matches dotfiles, so a
        // committing writer's .part-….npz.tmp would appear mid-write)
        // are never shard files
        Seq(st).filter(f => f.isFile && visible(f.getPath.getName))
    }.map(_.getPath.toString).sorted
  }

  /** Position the stream at the body of the named zip entry. */
  def openEntry(fs: FileSystem, path: Path, entryName: String): (InputStream, NpyHeader) = {
    val zin = new ZipInputStream(new BufferedInputStream(fs.open(path), 1 << 16))
    try {
      var e = zin.getNextEntry
      while (e != null && e.getName != entryName) e = zin.getNextEntry
      require(e != null, s"$path: zip entry '$entryName' not found")
      (zin, Npy.readHeader(zin))
    } catch { case t: Throwable => zin.close(); throw t }
  }
}

final class NpzTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {

  private val pathOpt: String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "npz source requires a path")
    p
  }
  private val vectorsEntry =
    options.getOrDefault("vectorsEntry", NpzVectorSource.DefaultVectorsEntry)
  private val idsEntry =
    options.getOrDefault("idsEntry", NpzVectorSource.DefaultIdsEntry)

  private def hadoopConf: Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration

  override def name(): String = s"npz($pathOpt)"
  override def schema(): StructType = NpzVectorSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new NpzScanBuilder(pathOpt, vectorsEntry, idsEntry,
      HadoopConfSnapshot.capture(hadoopConf))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new NpzWriteBuilder(pathOpt, info.schema(), vectorsEntry, idsEntry,
      HadoopConfSnapshot.capture(hadoopConf))
}

// ---------------------------------------------------------------- read

final class NpzScanBuilder(
    pathOpt: String, vectorsEntry: String, idsEntry: String,
    snap: HadoopConfSnapshot)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = NpzVectorSource.schema
  private var pushedCounts = 0

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) with no grouping is answerable from the NPY headers
    * alone — each shard's row count is in its ids entry header, so a
    * corpus-wide count never iterates a row. Partial pushdown: the
    * scan emits one count per file and Spark sums them.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    false // one partial row per shard file; Spark does the final sum

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.CountStar
    if (agg.groupByExpressions.nonEmpty || agg.aggregateExpressions.isEmpty ||
        !agg.aggregateExpressions.forall(_.isInstanceOf[CountStar]))
      false
    else { pushedCounts = agg.aggregateExpressions.length; true }
  }

  override def build(): Scan =
    if (pushedCounts > 0)
      new NpzCountScan(pathOpt, pushedCounts, idsEntry, snap)
    else new NpzScan(pathOpt, required, vectorsEntry, idsEntry, snap)
}

/** Header-only COUNT(*) scan: one partition per shard file, each
  * emitting a single row of that file's row count read from the ids
  * NPY header — no entry bodies are ever opened.
  */
final class NpzCountScan(
    pathOpt: String, counts: Int, idsEntry: String, snap: HadoopConfSnapshot)
    extends Scan with Batch {
  private lazy val files: Seq[String] =
    NpzVectorSource.listFiles(snap.conf, pathOpt)
  override def readSchema(): StructType =
    StructType((0 until counts).map(i =>
      StructField(s"count_$i", org.apache.spark.sql.types.LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"NpzScan[files=${files.size}, pushed=COUNT(*)]"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => NpzInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new NpzCountReaderFactory(counts, idsEntry, snap)
}

final class NpzCountReaderFactory(
    counts: Int, idsEntry: String, snap: HadoopConfSnapshot)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val path = new Path(partition.asInstanceOf[NpzInputPartition].path)
      private var done = false
      override def next(): Boolean = !done && { done = true; true }
      override def get(): InternalRow = {
        val fs = path.getFileSystem(snap.conf)
        val (in, hdr) = NpzVectorSource.openEntry(fs, path, idsEntry)
        try {
          val row = new GenericInternalRow(counts)
          var i = 0
          while (i < counts) { row.update(i, hdr.rows); i += 1 }
          row
        } finally in.close()
      }
      override def close(): Unit = ()
    }
}

final class NpzScan(
    pathOpt: String, required: StructType,
    vectorsEntry: String, idsEntry: String, snap: HadoopConfSnapshot)
    extends Scan with Batch {
  // batch reads resolve the file set once, at plan time
  private lazy val files: Seq[String] =
    NpzVectorSource.listFiles(snap.conf, pathOpt)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"NpzScan[files=${files.size}, columns=${required.fieldNames.mkString(",")}]"

  /** Batch planning splits WITHIN files when it can: STORED zip
    * entries (numpy `savez` and this sink) are raw byte ranges, so a
    * row range is a seek — one huge shard never serializes onto one
    * task. Rows per split follow `spark.sql.files.maxPartitionBytes`,
    * the same knob the parquet scan obeys. DEFLATE entries
    * (`savez_compressed`) and index-parse failures fall back to one
    * whole-file partition (the streaming reader reports real errors).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val maxBytes = NpzScan.maxSplitBytes()
    // Planning IO (stat per file; central directory + two NPY headers
    // for the files large enough to split) runs in parallel — on an
    // object store with many large shards, sequential driver round
    // trips would dominate planning time.
    import scala.collection.parallel.CollectionConverters._
    files.par.map(planFile(_, maxBytes)).seq.flatten.toArray
  }

  private def planFile(f: String, maxBytes: Long): Seq[InputPartition] = {
    try {
      val p = new Path(f)
      val fs = p.getFileSystem(snap.conf)
      // Length gate: a file that fits one split can never row-split,
      // so it skips the central-directory reads entirely — driver-side
      // planning IO is paid only by the (few, large) files it helps.
      if (fs.getFileStatus(p).getLen <= maxBytes)
        return Seq(NpzInputPartition(f))
      val ents = ZipIndex.entries(fs, p)
      val vec = ents.find(_.name == vectorsEntry)
      val ids = ents.find(_.name == idsEntry)
      if (vec.isEmpty || ids.isEmpty || vec.get.method != 0 || ids.get.method != 0)
        return Seq(NpzInputPartition(f))
      val in = fs.open(p)
      val (vh, vHdrLen, ih, iHdrLen) =
        try {
          in.seek(vec.get.dataOffset)
          val c1 = new CountingInputStream(in)
          val vh = Npy.readHeader(c1)
          in.seek(ids.get.dataOffset)
          val c2 = new CountingInputStream(in)
          val ih = Npy.readHeader(c2)
          (vh, c1.count, ih, c2.count)
        } finally in.close()
      // only shapes/dtypes the split reader decodes; anything else
      // falls back to the whole-file reader, which errors loudly
      if (vh.shape.length != 2 || ih.shape.length != 1 ||
          vh.shape.head != ih.shape.head ||
          (vh.descr != "<f4" && vh.descr != "<f8") ||
          (ih.descr != "<i8" && ih.descr != "<i4"))
        return Seq(NpzInputPartition(f))
      val n = vh.shape.head
      val rowBytes = math.max(1L, vh.shape(1) * vh.elemSize + ih.elemSize)
      val rowsPerSplit = math.max(1L, maxBytes / rowBytes)
      if (n <= rowsPerSplit) Seq(NpzInputPartition(f))
      else (0L until n by rowsPerSplit).map { s =>
        NpzSplitPartition(f, s, math.min(rowsPerSplit, n - s),
          vec.get.dataOffset + vHdrLen, vh.descr, vh.shape(1).toInt,
          ids.get.dataOffset + iHdrLen, ih.descr): InputPartition
      }
    } catch {
      case scala.util.control.NonFatal(_) => Seq(NpzInputPartition(f))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NpzReaderFactory(required, vectorsEntry, idsEntry, snap)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new NpzMicroBatchStream(pathOpt, required, vectorsEntry, idsEntry, snap)
}

object NpzScan {
  /** The scan-side split size, from the session's file-split knob. */
  private[sources] def maxSplitBytes(): Long =
    try
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        SparkSession.active.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    catch { case scala.util.control.NonFatal(_) => 128L * 1024 * 1024 }
}

/** Counts logical bytes consumed — measures NPY header length when
  * parsing at a seek offset.
  */
private[sources] final class CountingInputStream(in: InputStream) extends InputStream {
  var count: Long = 0L
  override def read(): Int = {
    val b = in.read(); if (b >= 0) count += 1; b
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    val n = in.read(b, off, len); if (n > 0) count += n; n
  }
}

/** Streaming ingest over an append-only directory of NPZ shards — the
  * Spark-native analog of the reference's incremental loader
  * (`load_coco_embeddings.py:58-112`: NPZ → batched POSTs). An offset
  * is the set of shard files seen so far (newline-joined in the
  * checkpoint log); each trigger's batch is the newly-arrived files,
  * one partition per file. Monotonicity is guaranteed by unioning the
  * current listing with everything already seen, so a file deleted
  * mid-stream can never move an offset backwards. Listing cadence is
  * one `listStatus` per trigger — the same cost model as Spark's own
  * FileStreamSource (at very large file counts, use its notification
  * pattern; shard files at 100 TB are COARSE, sized by write tasks).
  */
final class NpzMicroBatchStream(
    pathOpt: String, required: StructType,
    vectorsEntry: String, idsEntry: String, snap: HadoopConfSnapshot)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private var seen: Set[String] = Set.empty

  override def initialOffset(): Offset = NpzOffset(Nil)

  override def latestOffset(): Offset = {
    seen = seen ++ NpzVectorSource.listFiles(snap.conf, pathOpt)
    NpzOffset(seen.toSeq.sorted)
  }

  override def deserializeOffset(json: String): Offset =
    NpzOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val prev = start.asInstanceOf[NpzOffset].files.toSet
    end.asInstanceOf[NpzOffset].files.filterNot(prev)
      .map(f => NpzInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NpzReaderFactory(required, vectorsEntry, idsEntry, snap)

  override def commit(end: Offset): Unit =
    seen = seen ++ end.asInstanceOf[NpzOffset].files

  override def stop(): Unit = ()
}

final case class NpzOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  // Spark's OffsetSeqLog is LINE-oriented (one offset per line), so
  // the serialized form must be newline-free: a JSON array.
  override def json(): String =
    files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object NpzOffset {
  def fromJson(json: String): NpzOffset = {
    val t = json.trim
    if (t.isEmpty || t == "[]") NpzOffset(Nil)
    else graft.server.Json.parse(t) match {
      case v: Vector[_] => NpzOffset(v.map(_.toString))
      case other =>
        throw new IllegalArgumentException(s"bad npz offset json: $other")
    }
  }
}

final case class NpzInputPartition(path: String) extends InputPartition

/** A row range of one STORED-entry file: bodies are raw byte ranges,
  * so the reader seeks straight to its slice of each entry.
  */
final case class NpzSplitPartition(
    path: String, rowStart: Long, rowCount: Long,
    vecBodyOffset: Long, vecDescr: String, dim: Int,
    idsBodyOffset: Long, idsDescr: String) extends InputPartition

final class NpzReaderFactory(
    required: StructType, vectorsEntry: String, idsEntry: String,
    snap: HadoopConfSnapshot)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case NpzInputPartition(path) =>
        new NpzPartitionReader(path, required, vectorsEntry, idsEntry, snap)
      case sp: NpzSplitPartition =>
        new NpzSplitReader(sp, required, snap)
    }
}

/** Reads one row range of a STORED-entry NPZ: the id slice arrives in
  * one positioned read; vectors stream sequentially from a single
  * seek. An empty projection (count) touches no bytes at all.
  */
final class NpzSplitReader(
    p: NpzSplitPartition, required: StructType, snap: HadoopConfSnapshot)
    extends PartitionReader[InternalRow] {

  private val needId = required.fieldNames.contains("id")
  private val needVec = required.fieldNames.contains("vector")
  private val idElem = p.idsDescr match {
    case "<i8" => 8
    case "<i4" => 4
    case other => throw new IllegalArgumentException(s"id descr '$other'")
  }
  private val isF8 = p.vecDescr == "<f8"
  private val vecElem = if (isF8) 8 else 4
  private val in =
    if (needId || needVec)
      new Path(p.path).getFileSystem(snap.conf).open(new Path(p.path))
    else null

  private val ids: Array[Long] = if (needId) {
    val buf = new Array[Byte]((p.rowCount * idElem).toInt)
    in.readFully(p.idsBodyOffset + p.rowStart * idElem, buf, 0, buf.length)
    val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](p.rowCount.toInt)
    var j = 0
    if (idElem == 8) while (j < out.length) { out(j) = bb.getLong(); j += 1 }
    else while (j < out.length) { out(j) = bb.getInt().toLong; j += 1 }
    out
  } else null

  private val rowBuf = if (needVec) new Array[Byte](p.dim * vecElem) else null
  private val floats = if (needVec) new Array[Float](p.dim) else null
  if (needVec) in.seek(p.vecBodyOffset + p.rowStart * p.dim.toLong * vecElem)
  private var i = -1L

  override def next(): Boolean = {
    i += 1
    if (i >= p.rowCount) false
    else {
      if (needVec) {
        Npy.readFully(in, rowBuf)
        val bb = ByteBuffer.wrap(rowBuf).order(ByteOrder.LITTLE_ENDIAN)
        var j = 0
        if (isF8) while (j < p.dim) { floats(j) = bb.getDouble().toFloat; j += 1 }
        else while (j < p.dim) { floats(j) = bb.getFloat(); j += 1 }
      }
      true
    }
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](required.length)
    var f = 0
    while (f < required.length) {
      vals(f) = required.fields(f).name match {
        case "id" => ids(i.toInt)
        case "vector" => UnsafeArrayData.fromPrimitiveArray(floats)
        case other => throw new IllegalStateException(s"unknown column $other")
      }
      f += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = if (in != null) in.close()
}

/** Streams one NPZ file. Ids are read in a first cheap pass (8 B/row);
  * vectors stream row-by-row in the second, only if projected.
  */
final class NpzPartitionReader(
    pathStr: String, required: StructType,
    vectorsEntry: String, idsEntry: String, snap: HadoopConfSnapshot)
    extends PartitionReader[InternalRow] {

  private val needId = required.fieldNames.contains("id")
  private val needVec = required.fieldNames.contains("vector")
  private val path = new Path(pathStr)
  private val fs = path.getFileSystem(snap.conf)

  private var ids: Array[Long] = null
  private var n: Long = -1L
  private var vecIn: InputStream = null
  private var dim = 0
  private var elemSize = 4
  private var isF8 = false
  private var rowBuf: Array[Byte] = null
  private var floats: Array[Float] = null
  private var i = -1L

  // ids pass — also the row count when vectors aren't projected
  if (needId || !needVec) {
    val (in, hdr) = NpzVectorSource.openEntry(fs, path, idsEntry)
    try {
      if (needId) ids = Npy.readLongs(in, hdr)
      n = hdr.rows
    } finally in.close()
  }
  if (needVec) {
    val (in, hdr) = NpzVectorSource.openEntry(fs, path, vectorsEntry)
    vecIn = in
    require(hdr.shape.length == 2,
      s"$pathStr: expected 2-D vectors in '$vectorsEntry', got shape ${hdr.shape}")
    require(n < 0 || hdr.shape.head == n,
      s"$pathStr: '$vectorsEntry' has ${hdr.shape.head} rows but '$idsEntry' has $n")
    n = hdr.shape.head
    dim = hdr.shape(1).toInt
    isF8 = hdr.descr == "<f8"
    elemSize = hdr.elemSize
    require(hdr.descr == "<f4" || isF8,
      s"$pathStr: unsupported vector descr '${hdr.descr}'")
    rowBuf = new Array[Byte](dim * elemSize)
    floats = new Array[Float](dim)
  }

  override def next(): Boolean = {
    i += 1
    if (i >= n) false
    else {
      if (needVec) {
        Npy.readFully(vecIn, rowBuf)
        val bb = ByteBuffer.wrap(rowBuf).order(ByteOrder.LITTLE_ENDIAN)
        var j = 0
        if (isF8) while (j < dim) { floats(j) = bb.getDouble().toFloat; j += 1 }
        else while (j < dim) { floats(j) = bb.getFloat(); j += 1 }
      }
      true
    }
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](required.length)
    var f = 0
    while (f < required.length) {
      vals(f) = required.fields(f).name match {
        case "id" => ids(i.toInt)
        // fromPrimitiveArray copies, so the float buffer is reusable
        case "vector" => UnsafeArrayData.fromPrimitiveArray(floats)
        case other => throw new IllegalStateException(s"unknown column $other")
      }
      f += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = if (vecIn != null) vecIn.close()
}

// --------------------------------------------------------------- write

final class NpzWriteBuilder(
    dir: String, schema: StructType, vectorsEntry: String, idsEntry: String,
    snap: HadoopConfSnapshot)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new NpzBatchWrite(dir, schema, vectorsEntry, idsEntry, doTruncate, snap)
  }
}

final case class NpzCommitMessage(file: String, rows: Long) extends WriterCommitMessage

final class NpzBatchWrite(
    dir: String, schema: StructType, vectorsEntry: String, idsEntry: String,
    truncate: Boolean, snap: HadoopConfSnapshot)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // Driver-side setup: mkdir; on overwrite drop prior shard files
    // (non-atomic replace, documented — same guarantee as Hadoop's
    // non-transactional committers without a _temporary protocol).
    val p = new Path(dir)
    val fs = p.getFileSystem(snap.conf)
    if (!fs.exists(p)) fs.mkdirs(p)
    if (truncate && fs.exists(p))
      fs.listStatus(p).foreach { st =>
        if (st.isFile && st.getPath.getName.endsWith(".npz")) fs.delete(st.getPath, false)
      }
    new NpzWriterFactory(dir, schema, vectorsEntry, idsEntry, snap)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class NpzWriterFactory(
    dir: String, schema: StructType, vectorsEntry: String, idsEntry: String,
    snap: HadoopConfSnapshot)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new NpzDataWriter(dir, schema, vectorsEntry, idsEntry, partitionId, taskId, snap)
}

/** One NPZ shard per task. Vector bytes spool to an executor-local
  * scratch file (row count is unknown until the partition is drained,
  * and NPY headers lead the body); ids accumulate at 8 B/row. Task
  * commit assembles the zip at `.name.tmp` and renames — task-atomic.
  */
final class NpzDataWriter(
    dir: String, schema: StructType, vectorsEntry: String, idsEntry: String,
    partitionId: Int, taskId: Long, snap: HadoopConfSnapshot)
    extends DataWriter[InternalRow] {

  private val idIdx = schema.fieldIndex("id")
  private val vecIdx = schema.fieldIndex("vector")
  private val ids = new ArrayBuffer[Long]
  private var dim = -1
  private val scratch = java.io.File.createTempFile(s"npz-$partitionId-", ".vecs")
  private val out = new DataOutputStream(
    new BufferedOutputStream(new java.io.FileOutputStream(scratch), 1 << 16))
  private var rowBB: ByteBuffer = null

  override def write(record: InternalRow): Unit = {
    require(!record.isNullAt(idIdx) && !record.isNullAt(vecIdx),
      "npz sink rejects null id/vector")
    ids += record.getLong(idIdx)
    val arr = record.getArray(vecIdx)
    val d = arr.numElements()
    if (dim < 0) {
      dim = d
      rowBB = ByteBuffer.allocate(d * 4).order(ByteOrder.LITTLE_ENDIAN)
    } else require(d == dim, s"ragged vector: $d elements, expected $dim")
    rowBB.clear()
    var j = 0
    while (j < d) {
      require(!arr.isNullAt(j), "npz sink rejects null vector elements")
      rowBB.putFloat(arr.getFloat(j)); j += 1
    }
    out.write(rowBB.array(), 0, d * 4)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    if (ids.isEmpty) { scratch.delete(); return NpzCommitMessage(null, 0L) }
    val name = f"part-$partitionId%05d-$taskId.npz"
    val fs = new Path(dir).getFileSystem(snap.conf)
    val tmp = new Path(dir, s".$name.tmp")
    val dst = new Path(dir, name)

    // Entries are written STORED, numpy-savez style: uncompressed raw
    // ranges keep the file SPLITTABLE on read (NpzScan row-splits
    // STORED entries by seek). STORED needs size+crc up front: one
    // extra sequential pass over the local scratch spool computes the
    // vectors CRC before the copy.
    val vecHeader = Npy.headerBytes("<f4", Seq(ids.length.toLong, dim.toLong))
    val vecSize = vecHeader.length.toLong + scratch.length()
    val vcrc = new java.util.zip.CRC32
    vcrc.update(vecHeader)
    locally {
      val in = new BufferedInputStream(new java.io.FileInputStream(scratch), 1 << 16)
      try {
        val buf = new Array[Byte](1 << 16)
        var r = in.read(buf)
        while (r >= 0) { vcrc.update(buf, 0, r); r = in.read(buf) }
      } finally in.close()
    }
    val idsHeader = Npy.headerBytes("<i8", Seq(ids.length.toLong))
    val idsBody = {
      val bb = ByteBuffer.allocate(ids.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      ids.foreach(bb.putLong)
      bb.array()
    }
    val icrc = new java.util.zip.CRC32
    icrc.update(idsHeader); icrc.update(idsBody)

    def storedEntry(entryName: String, size: Long, crc: Long): ZipEntry = {
      val e = new ZipEntry(entryName)
      e.setMethod(ZipEntry.STORED)
      e.setSize(size); e.setCompressedSize(size); e.setCrc(crc)
      e
    }

    val zos = new ZipOutputStream(new BufferedOutputStream(fs.create(tmp, true), 1 << 16))
    try {
      zos.putNextEntry(storedEntry(vectorsEntry, vecSize, vcrc.getValue))
      zos.write(vecHeader)
      val in = new BufferedInputStream(new java.io.FileInputStream(scratch), 1 << 16)
      try {
        val buf = new Array[Byte](1 << 16)
        var r = in.read(buf)
        while (r >= 0) { zos.write(buf, 0, r); r = in.read(buf) }
      } finally in.close()
      zos.closeEntry()
      zos.putNextEntry(storedEntry(idsEntry,
        idsHeader.length.toLong + idsBody.length, icrc.getValue))
      zos.write(idsHeader)
      zos.write(idsBody)
      zos.closeEntry()
    } finally {
      zos.close()
      scratch.delete()
    }
    require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
    NpzCommitMessage(dst.toString, ids.length.toLong)
  }

  override def abort(): Unit = {
    out.close()
    scratch.delete()
    val fs = new Path(dir).getFileSystem(snap.conf)
    val tmp = new Path(dir, f".part-$partitionId%05d-$taskId.npz.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}
