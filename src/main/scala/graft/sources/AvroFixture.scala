package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}

/** Distributed Avro container writer for fixture staging: each task
  * writes one `part-<pid>.avro` through the Hadoop FileSystem API (so
  * the same code path works against HDFS/object stores on a real
  * cluster, not just local disk). A small sync interval keeps blocks
  * fine-grained enough that [[AvroSource]]'s byte-range splitting has
  * sync points to land on even in small test files.
  */
object AvroFixture {

  /** Flat (doc_id long, lang string, n_chars long) schema. */
  val DocSchema: Schema = SchemaBuilder.record("doc").fields()
    .requiredLong("doc_id")
    .requiredString("lang")
    .requiredLong("n_chars")
    .endRecord()

  /** Write `df` (columns doc_id, lang, n_chars) as Avro containers
    * under `dir`, one file per non-empty partition.
    */
  def write(df: DataFrame, dir: String, syncInterval: Int = 2048): Unit = {
    val conf = HadoopConfSnapshot.capture(
      df.sparkSession.sessionState.newHadoopConf())
    val schemaJson = DocSchema.toString
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = TaskContext.getPartitionId()
        val path = new HPath(dir, f"part-$pid%05d.avro")
        val fs = path.getFileSystem(conf.conf)
        val out = fs.create(path, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.setSyncInterval(syncInterval)
        w.create(schema, out)
        try {
          it.foreach { r =>
            w.append(new GenericRecordBuilder(schema)
              .set("doc_id", r.getLong(0))
              .set("lang", r.getString(1))
              .set("n_chars", r.getLong(2))
              .build())
          }
        } finally w.close()
      }
    }
  }
}
