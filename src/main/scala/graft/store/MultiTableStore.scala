package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lsh.{LshConfig, LshModel}

/** OR-probing multi-table LSH store — the alternative
  * `LshConfig(multiTable = true)` layout (see the trade-off discussion
  * on [[LshConfig]]). This is the reference's 3-table INTENT
  * (`sharding/lsh_sharding.py:57-74`) realized: its mod-sum bucket
  * formula collapses the tables into one code (and degenerates
  * entirely at power-of-two bucket counts); here each table keeps its
  * own 2^k-bucket code and a query unions candidates across tables,
  * which is what buys recall in every published LSH system.
  *
  * Layout: each (id, embedding) row is written once per table under
  * `table=<t>/bucket=<b>` partitions — ×L storage, the standard
  * multi-table cost. Search probes `(table, bucket)` pairs via
  * partition-pruned scan, dedups candidates by id (a shuffle of the
  * probed subset only — ~probes·2^-k of one corpus copy), then exact
  * distance + top-k. Exact search scans table 0 (one full copy, no
  * dedup needed).
  */
final class MultiTableStore(
    spark: SparkSession,
    val path: String,
    val model: LshModel) {

  def indexDf: DataFrame = spark.read.parquet(path)

  /** Predicate selecting the probed (table, bucket) partitions —
    * OR-of-ANDs over the two partition columns, so the scan prunes to
    * exactly the probed directories.
    */
  def pruneFilter(q: Array[Double], probes: Int): Column =
    model.tableCandidates(q, probes)
      .map { case (t, b) => col("table") === t && col("bucket") === b }
      .reduce(_ || _)

  /** Pruned kNN: probed partitions → id-dedup → exact top-k. */
  def search(q: Array[Double], k: Int, probes: Int): DataFrame =
    searchIn(indexDf.where(pruneFilter(q, probes)), q, k)

  /** Exact kNN over one full copy of the corpus (table 0). */
  def exact(q: Array[Double], k: Int): DataFrame =
    VectorStore.searchIn(indexDf.where(col("table") === 0), q, k)

  private def searchIn(df: DataFrame, q: Array[Double], k: Int): DataFrame =
    VectorStore.searchIn(df.select("id", "embedding").dropDuplicates("id"), q, k)

  /** Append vectors: one stored row per (table, row), like the build.
    * Mutation parity with [[VectorStore.add]] — a user on the
    * multi-table layout keeps the same ingest surface.
    */
  def add(df: DataFrame, idCol: String = "id",
          embCol: String = "embedding"): Unit =
    MultiTableStore.encode(df, model, idCol, embCol)
      .write.mode("append").partitionBy("table", "bucket").parquet(path)

  /** Delete ids, rewriting ONLY the (table, bucket) partitions that
    * hold them — each id lives in exactly L partitions, so a delete
    * touches ≤ L·|ids| directories regardless of corpus size (the
    * [[VectorStore.delete]] contract, ×L). Returns rows removed
    * (counted across copies) / L.
    */
  def delete(ids: Seq[Long]): Long = {
    if (ids.isEmpty) return 0L
    val idSet = ids.map(Long.box)
    val affected = indexDf.where(col("id").isin(idSet: _*))
      .select(col("table").cast("int"), col("bucket").cast("int"))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1)))
    if (affected.isEmpty) return 0L
    val hit = affected.map { case (t, b) =>
      col("table") === t && col("bucket") === b
    }.reduce(_ || _)
    val inParts = indexDf.where(hit)
    val before = inParts.count()
    val remaining = inParts.where(!col("id").isin(idSet: _*))
      .localCheckpoint(true)
    val kept = remaining.select(col("table").cast("int"),
        col("bucket").cast("int")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    remaining.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("table", "bucket").parquet(path)
    // dynamic overwrite leaves fully-emptied partitions' stale files
    MultiTableStore.dropPartitionDirs(spark, path,
      affected.filterNot(kept).toSeq)
    (before - remaining.count()) / cfgTables
  }

  private def cfgTables: Long = model.cfg.numHashTables.toLong

  /** Compact each (table, bucket) partition's small files (every add
    * appends ≥1 file per touched partition) — [[VectorStore.compact]]
    * over the two-level layout.
    */
  def compact(targetRowsPerFile: Long = 1 << 20): (Long, Long) = {
    val before = VectorStore.countDataFiles(spark, path)
    val df = spark.read.parquet(path).localCheckpoint(true)
    val maxRow = df.groupBy("table", "bucket").count().agg(max("count")).head
    if (maxRow.isNullAt(0)) return (before, before)
    val filesPerPart = math.max(1L,
      (maxRow.getLong(0) + targetRowsPerFile - 1) / targetRowsPerFile)
    val numParts = math.min(
      model.cfg.numHashTables.toLong * model.bucketsPerTable * filesPerPart,
      Int.MaxValue.toLong)
    df.repartition(numParts.toInt, col("table"), col("bucket"),
        pmod(hash(col("id")), lit(filesPerPart)))
      .sortWithinPartitions("table", "bucket", "id")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("table", "bucket").parquet(path)
    (before, VectorStore.countDataFiles(spark, path))
  }
}

object MultiTableStore {

  /** One stored row per (table, input row) with its per-table 2^k
    * bucket code — the ×L scatter, shared by build and add.
    */
  private def encode(df: DataFrame, model: LshModel,
                     idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col(embCol).as("embedding"))
      .select(col("id"), col("embedding"),
        posexplode(model.tableBucketsCol(col("embedding"))))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "bucket")

  private[store] def dropPartitionDirs(spark: SparkSession, path: String,
                                       parts: Seq[(Int, Int)]): Unit = {
    if (parts.isEmpty) return
    val conf = spark.sparkContext.hadoopConfiguration
    parts.foreach { case (t, b) =>
      val p = new org.apache.hadoop.fs.Path(s"$path/table=$t/bucket=$b")
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  /** Build: per-table bucket codes (one fused-kernel pass per table),
    * one stored row per (table, row), partitioned write. The
    * repartition concentrates each (table, bucket) into one writer
    * task, like [[VectorStore.build]].
    */
  def build(spark: SparkSession, df: DataFrame, path: String,
            cfg: LshConfig, idCol: String = "id",
            embCol: String = "embedding"): MultiTableStore = {
    require(cfg.multiTable, "MultiTableStore requires LshConfig(multiTable = true)")
    val model = LshModel(cfg)
    encode(df, model, idCol, embCol)
      .repartition(cfg.numHashTables * model.bucketsPerTable,
        col("table"), col("bucket"))
      .write.mode("overwrite").partitionBy("table", "bucket").parquet(path)
    model.save(s"$path/_lsh_model.json")
    new MultiTableStore(spark, path, model)
  }

  def open(spark: SparkSession, path: String): MultiTableStore = {
    val model = LshModel.load(s"$path/_lsh_model.json")
    require(model.cfg.multiTable,
      s"$path holds a single-table index; open it with VectorStore.open")
    new MultiTableStore(spark, path, model)
  }
}
