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
}

object MultiTableStore {

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
    df.select(col(idCol).cast("long").as("id"), col(embCol).as("embedding"))
      .select(col("id"), col("embedding"),
        posexplode(model.tableBucketsCol(col("embedding"))))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "bucket")
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
