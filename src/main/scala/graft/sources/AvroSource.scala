package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for Avro Object Container Files, built on the
  * `org.apache.avro` core library (no spark-avro module on this
  * classpath). Flat records of primitive fields only — the training
  * metadata/export shape — with the two properties that matter at
  * 100 TB:
  *
  *  - *sync-marker splitting*: Avro containers interleave a 16-byte
  *    sync marker between blocks, so a byte range [start, end) is an
  *    independently readable split (`DataFileReader.sync(start)` /
  *    `pastSync(end)` — the same protocol Hadoop's AvroInputFormat
  *    uses). One huge container fans out across tasks like parquet
  *    row groups; split size is the `maxSplitBytes` option
  *    (default 128 MiB).
  *  - *column pruning via reader schema*: Avro schema resolution skips
  *    non-projected fields during decode (no per-row materialization
  *    of dropped columns), so `SELECT lang FROM avro` never
  *    deserializes `text`-sized fields.
  *
  * Supported field types: long, int, string, double, float, boolean,
  * bytes, arrays of those (the embedding-export layout), each
  * optionally as the nullable `[null, T]` union. Anything else fails
  * loudly at schema inference — a silent coercion would corrupt data.
  * The matching DSv2 sink ([[AvroWriteBuilder]]) maps a DataFrame
  * schema back to the same shapes.
  *
  * Corruption policy (`mode` option): `FAILFAST` (default) kills the
  * job on any unreadable container — the right default for data whose
  * loss must be LOUD. `PERMISSIVE` quarantines instead (the x22
  * corrupt-CSV treatment applied to binary containers): a file whose
  * header won't open contributes zero rows, and a truncated/corrupt
  * block mid-file keeps the records decoded before the corruption
  * point and drops the rest of that split — each with one warning
  * naming the file. At 100 TB one torn container must not kill a
  * thousand-task read; the unsupported-TYPE policy above is separate
  * and always fails loudly (that's a schema contract, not bit rot).
  */
class AvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "avrograft"

  // Write path: the DataFrame's own schema defines the container
  // schema (no files to infer from on a fresh sink dir).
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (schema, _) = AvroSource.writerSchema(options)
    AvroSource.toSpark(schema)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(new CaseInsensitiveStringMap(properties), schema)
}

object AvroSource {

  private[sources] def isPermissive(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("mode")).exists(_.equalsIgnoreCase("permissive"))

  /** Open a container reader over a fresh FsInput, closing the input
    * when the reader constructor throws — otherwise every corrupt
    * container leaks one open stream per probing task on the
    * quarantine (and FAILFAST error) paths.
    */
  private[sources] def openReader(
      path: HPath, conf: org.apache.hadoop.conf.Configuration,
      datum: GenericDatumReader[GenericRecord]): DataFileReader[GenericRecord] = {
    val in = new FsInput(path, conf)
    try new DataFileReader[GenericRecord](in, datum)
    catch { case e: Throwable => closeQuietly(in); throw e }
  }

  private[sources] def closeQuietly(c: java.io.Closeable): Unit =
    try c.close() catch { case scala.util.control.NonFatal(_) => () }

  /** First .avro file's writer schema + the file list (sorted for
    * deterministic partition planning). In PERMISSIVE mode a file
    * whose header won't open is skipped for inference (later files
    * are tried in order) — the read side then quarantines it too.
    */
  private[sources] def writerSchema(
      options: CaseInsensitiveStringMap): (Schema, Seq[FileStatus]) = {
    val path = options.get("path")
    require(path != null, "avrograft source requires a path")
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val files = listAvro(fs, p).sortBy(_.getPath.toString)
    require(files.nonEmpty, s"no .avro files under $path")
    def headerOf(f: FileStatus): Schema = {
      val r = AvroSource.openReader(f.getPath, conf,
        new GenericDatumReader[GenericRecord]())
      try r.getSchema
      finally r.close()
    }
    if (!isPermissive(options)) (headerOf(files.head), files)
    else {
      val it = files.iterator.map(f =>
        try Some(headerOf(f))
        catch {
          case scala.util.control.NonFatal(e) =>
            AvroSource.warnQuarantine(f.getPath.toString,
              s"unreadable header during schema inference (${e.getMessage})")
            None
        })
      (it.collectFirst { case Some(s) => s }.getOrElse(
        throw new IllegalArgumentException(
          s"no readable .avro container under $path")), files)
    }
  }

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[AvroSource])

  private[sources] def warnQuarantine(file: String, why: String): Unit =
    log.warn(s"avrograft PERMISSIVE: quarantining $file — $why")

  private def listAvro(fs: FileSystem, p: HPath): Seq[FileStatus] = {
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq(st)
    else fs.listStatus(p).toSeq.flatMap { c =>
      if (c.isDirectory) listAvro(fs, c.getPath)
      else if (c.getPath.getName.endsWith(".avro")) Seq(c)
      else Nil
    }
  }

  /** Unwrap `[null, T]` unions; null means "unsupported shape". */
  private def unwrap(s: Schema): Option[(Schema, Boolean)] = s.getType match {
    case Schema.Type.UNION =>
      val ts = s.getTypes.asScala
      if (ts.size == 2 && ts.exists(_.getType == Schema.Type.NULL))
        ts.find(_.getType != Schema.Type.NULL).map((_, true))
      else None
    case _ => Some((s, false))
  }

  private def primToSpark(t: Schema.Type): Option[DataType] = t match {
    case Schema.Type.LONG    => Some(LongType)
    case Schema.Type.INT     => Some(IntegerType)
    case Schema.Type.STRING  => Some(StringType)
    case Schema.Type.DOUBLE  => Some(DoubleType)
    case Schema.Type.FLOAT   => Some(FloatType)
    case Schema.Type.BOOLEAN => Some(BooleanType)
    case Schema.Type.BYTES   => Some(BinaryType)
    case _                   => None
  }

  private def anyToSpark(sch: Schema): Option[DataType] = sch.getType match {
    case Schema.Type.ARRAY =>
      primToSpark(sch.getElementType.getType)
        .map(et => ArrayType(et, containsNull = false))
    case t => primToSpark(t)
  }

  private[sources] def toSpark(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"avrograft supports flat record schemas, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (inner, nullable) = unwrap(f.schema()).getOrElse(
        throw new IllegalArgumentException(
          s"unsupported avro union for field ${f.name}: ${f.schema()}"))
      val dt = anyToSpark(inner).getOrElse(
        throw new IllegalArgumentException(
          s"unsupported avro type for field ${f.name}: ${inner.getType}"))
      StructField(f.name, dt, nullable)
    })
  }

  /** Reader (projection) schema keeping only `names`, in writer-field
    * order — Avro schema resolution then skips the dropped fields'
    * bytes during decode.
    */
  private[sources] def project(writer: Schema, names: Seq[String]): Schema = {
    val keep = names.toSet
    val fields = writer.getFields.asScala.filter(f => keep(f.name)).map { f =>
      new Schema.Field(f.name, f.schema, f.doc, f.defaultVal)
    }
    Schema.createRecord(writer.getName, writer.getDoc, writer.getNamespace,
      false, fields.toList.asJava)
  }

  /** Spark → Avro schema (inverse of [[toSpark]]): flat primitives,
    * nullable columns become `[null, T]` unions. Fails loudly on
    * anything the reader could not round-trip.
    */
  private[sources] def toAvro(schema: StructType): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case StringType  => Schema.create(Schema.Type.STRING)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, _) => Schema.createArray(prim(et))
      case other => throw new IllegalArgumentException(
        s"avrograft sink supports primitive and array-of-primitive " +
          s"columns, got $other")
    }
    val fields = schema.fields.map { f =>
      val s =
        if (f.nullable)
          Schema.createUnion(util.Arrays.asList(
            Schema.create(Schema.Type.NULL), prim(f.dataType)))
        else prim(f.dataType)
      new Schema.Field(f.name, s, null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord("row", null, "graft", false,
      util.Arrays.asList(fields: _*))
  }
}

final class AvroTable(options: CaseInsensitiveStringMap, schema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"avrograft:${options.get("path")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(options, schema)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val syncInterval = Option(options.get("syncInterval"))
      .map(_.toInt).getOrElse(1 << 16)
    new AvroWriteBuilder(options.get("path"), info.schema(), syncInterval,
      HadoopConfSnapshot.capture(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
  }
}

// ---------------------------------------------------------------- write

/** Batch sink: one container file per non-empty task, committed via
  * hidden-tmp + rename (task-atomic, the NPZ-sink convention).
  * Overwrite deletes prior *.avro files; append relies on the
  * `part-<partition>-<task>` name carrying the session-unique task id
  * so successive appends never collide.
  */
final class AvroWriteBuilder(
    dir: String, schema: StructType, syncInterval: Int,
    snap: HadoopConfSnapshot)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  import org.apache.spark.sql.connector.write._

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(dir, schema, syncInterval, doTruncate, snap)
  }
}

final case class AvroCommitMessage(file: String, rows: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final class AvroBatchWrite(
    dir: String, schema: StructType, syncInterval: Int,
    truncate: Boolean, snap: HadoopConfSnapshot)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(snap.conf)
    if (!fs.exists(p)) fs.mkdirs(p)
    if (truncate)
      fs.listStatus(p).foreach { st =>
        if (st.isFile && st.getPath.getName.endsWith(".avro"))
          fs.delete(st.getPath, false)
      }
    new AvroWriterFactory(dir, schema, syncInterval, snap)
  }

  override def commit(messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = ()
}

final class AvroWriterFactory(
    dir: String, schema: StructType, syncInterval: Int,
    snap: HadoopConfSnapshot)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new AvroDataWriter(dir, schema, syncInterval, partitionId, taskId, snap)
}

final class AvroDataWriter(
    dir: String, schema: StructType, syncInterval: Int,
    partitionId: Int, taskId: Long, snap: HadoopConfSnapshot)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import org.apache.avro.generic.GenericData

  private val avroSchema = AvroSource.toAvro(schema)
  private val name = f"part-$partitionId%05d-$taskId.avro"
  private val fs = new HPath(dir).getFileSystem(snap.conf)
  private val tmp = new HPath(dir, s".$name.tmp")
  private var rows = 0L
  private var writer: org.apache.avro.file.DataFileWriter[GenericRecord] = _

  override def write(record: InternalRow): Unit = {
    if (writer == null) {
      val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[GenericRecord](avroSchema))
      w.setSyncInterval(syncInterval)
      w.create(avroSchema, fs.create(tmp, true))
      writer = w
    }
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.length) {
      val v: AnyRef =
        if (record.isNullAt(i)) {
          require(schema.fields(i).nullable,
            s"null in non-nullable column ${schema.fields(i).name}")
          null
        } else AvroDataWriter.toAvroValue(
          schema.fields(i).dataType, record, i)
      rec.put(i, v)
      i += 1
    }
    writer.append(rec)
    rows += 1
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (writer == null) return AvroCommitMessage(null, 0L)
    writer.close()
    val dst = new HPath(dir, name)
    require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
    AvroCommitMessage(dst.toString, rows)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    if (fs.exists(tmp)) fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}

object AvroDataWriter {
  /** One top-level column of an InternalRow as the boxed value Avro's
    * GenericDatumWriter expects (arrays become java Lists of boxed
    * elements; null elements are rejected — the read side declares
    * containsNull = false).
    */
  private[sources] def toAvroValue(dt: DataType, record: InternalRow,
      i: Int): AnyRef = dt match {
    case LongType    => java.lang.Long.valueOf(record.getLong(i))
    case IntegerType => Integer.valueOf(record.getInt(i))
    case StringType  => record.getUTF8String(i).toString
    case DoubleType  => java.lang.Double.valueOf(record.getDouble(i))
    case FloatType   => java.lang.Float.valueOf(record.getFloat(i))
    case BooleanType => java.lang.Boolean.valueOf(record.getBoolean(i))
    case BinaryType  => java.nio.ByteBuffer.wrap(record.getBinary(i))
    case ArrayType(et, _) =>
      val arr = record.getArray(i)
      val n = arr.numElements()
      val out = new java.util.ArrayList[AnyRef](n)
      var j = 0
      while (j < n) {
        require(!arr.isNullAt(j), "avrograft sink rejects null array elements")
        out.add(et match {
          case LongType    => java.lang.Long.valueOf(arr.getLong(j))
          case IntegerType => Integer.valueOf(arr.getInt(j))
          case StringType  => arr.getUTF8String(j).toString
          case DoubleType  => java.lang.Double.valueOf(arr.getDouble(j))
          case FloatType   => java.lang.Float.valueOf(arr.getFloat(j))
          case BooleanType => java.lang.Boolean.valueOf(arr.getBoolean(j))
          case BinaryType  => java.nio.ByteBuffer.wrap(arr.getBinary(j))
          case other => throw new IllegalArgumentException(s"unsupported $other")
        })
        j += 1
      }
      out
    case other => throw new IllegalArgumentException(s"unsupported $other")
  }
}

final class AvroScanBuilder(options: CaseInsensitiveStringMap, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Preserve writer-field order: Avro projection schemas must list
    // fields in a resolution-compatible order.
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => keep(f.name)))
  }

  override def build(): Scan = new AvroScan(options, required)
}

final class AvroScan(options: CaseInsensitiveStringMap, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"avrograft ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val (writer, files) = AvroSource.writerSchema(options)
    val maxSplit = Option(options.get("maxSplitBytes"))
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    files.flatMap { f =>
      val len = f.getLen
      val n = math.max(1L, (len + maxSplit - 1) / maxSplit)
      (0L until n).map { i =>
        val start = i * maxSplit
        val end = math.min(len, start + maxSplit)
        AvroPartition(f.getPath.toString, start, end)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = HadoopConfSnapshot.capture(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new AvroReaderFactory(conf, required, AvroSource.isPermissive(options))
  }

  /** Streaming form: file-list offsets (the NPZ-source convention) —
    * each micro-batch reads exactly the container files that appeared
    * since the last offset, whole-file per partition.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val conf = HadoopConfSnapshot.capture(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new AvroMicroBatchStream(options.get("path"), required, conf,
      AvroSource.isPermissive(options))
  }
}

final class AvroMicroBatchStream(
    path: String, required: StructType, snap: HadoopConfSnapshot,
    permissive: Boolean = false)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private var seen: Set[String] = Set.empty

  private def list(): Seq[(String, Long)] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(snap.conf)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(s => (s.getPath.toString, s.getLen))
      .sortBy(_._1)
  }

  override def initialOffset(): Offset = NpzOffset(Nil)

  override def latestOffset(): Offset = {
    seen = seen ++ list().map(_._1)
    NpzOffset(seen.toSeq.sorted)
  }

  override def deserializeOffset(json: String): Offset =
    NpzOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val prev = start.asInstanceOf[NpzOffset].files.toSet
    val lens = list().toMap
    // end = the file's byte length, NOT Long.MaxValue: Avro's
    // pastSync(pos) computes pos + SYNC_SIZE, which overflows on
    // MaxValue and reads as "already past" (zero rows).
    end.asInstanceOf[NpzOffset].files.filterNot(prev)
      .map { f =>
        val len = lens.getOrElse(f,
          new HPath(f).getFileSystem(snap.conf)
            .getFileStatus(new HPath(f)).getLen)
        AvroPartition(f, 0L, len): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(snap, required, permissive)

  override def commit(end: Offset): Unit =
    seen = seen ++ end.asInstanceOf[NpzOffset].files

  override def stop(): Unit = ()
}

final case class AvroPartition(path: String, start: Long, end: Long)
    extends InputPartition

final class AvroReaderFactory(conf: HadoopConfSnapshot, required: StructType,
                              permissive: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ap = p.asInstanceOf[AvroPartition]
    new AvroPartitionReader(conf, required, ap, permissive)
  }
}

/** Reads records in [first sync ≥ start, first sync ≥ end) — each
  * byte range yields a disjoint, exhaustive slice of the file's
  * blocks (the Hadoop split protocol). Decodes only projected fields.
  *
  * With `permissive`, corruption is quarantined instead of fatal: an
  * unopenable header yields an empty split, and a decode failure
  * mid-split (truncated block, torn sync) ends the split at the last
  * good record — a deterministic prefix, never garbage rows, because
  * Avro decoding fails before a partially-read record is surfaced.
  */
final class AvroPartitionReader(
    conf: HadoopConfSnapshot, required: StructType, part: AvroPartition,
    permissive: Boolean = false)
    extends PartitionReader[InternalRow] {

  private val reader: DataFileReader[GenericRecord] =
    try {
      val header = AvroSource.openReader(new HPath(part.path), conf.conf,
        new GenericDatumReader[GenericRecord]())
      val writer = try header.getSchema finally header.close()
      val projected = AvroSource.project(writer, required.fieldNames.toSeq)
      val r = AvroSource.openReader(new HPath(part.path), conf.conf,
        new GenericDatumReader[GenericRecord](writer, projected))
      try { r.sync(part.start); r }
      catch { case e: Throwable => AvroSource.closeQuietly(r); throw e }
    } catch {
      case scala.util.control.NonFatal(e) if permissive =>
        AvroSource.warnQuarantine(part.path,
          s"container header unreadable (${e.getMessage})")
        null
    }
  private var record: GenericRecord = _
  private val converters: Array[AnyRef => Any] =
    required.fields.map(f => AvroPartitionReader.converter(f.dataType))

  override def next(): Boolean = {
    if (reader == null) return false
    try {
      if (reader.hasNext && !reader.pastSync(part.end)) {
        record = reader.next(record)
        true
      } else false
    } catch {
      case scala.util.control.NonFatal(e) if permissive =>
        AvroSource.warnQuarantine(part.path,
          s"corrupt block at ~byte ${safeTell()} — keeping the " +
            s"records decoded before it (${e.getMessage})")
        false
    }
  }

  private def safeTell(): Long =
    try reader.tell() catch { case scala.util.control.NonFatal(_) => -1L }

  override def get(): InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < vals.length) {
      val v = record.get(required.fields(i).name)
      vals(i) = if (v == null) null else converters(i)(v.asInstanceOf[AnyRef])
      i += 1
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = if (reader != null) reader.close()
}

object AvroPartitionReader {
  private def converter(dt: DataType): AnyRef => Any = dt match {
    case StringType => v => UTF8String.fromString(v.toString)
    case BinaryType => v => {
      val bb = v.asInstanceOf[java.nio.ByteBuffer]
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    }
    case LongType | IntegerType | DoubleType | FloatType | BooleanType =>
      v => v
    case ArrayType(et, _) =>
      val elem = converter(et)
      v => {
        val it = v.asInstanceOf[java.util.Collection[AnyRef]].iterator()
        val buf = new scala.collection.mutable.ArrayBuffer[Any]()
        while (it.hasNext) buf += elem(it.next())
        new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toSeq)
      }
    case other =>
      throw new IllegalArgumentException(s"unsupported type $other")
  }
}
