package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only: decompose s22's shape — seed build, source stage, the
  * per-batch add (encode/write/commit), final search — to see where a
  * streaming ingest row's wall goes. Never driver-run.
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.lsh.LshConfig
    import graft.store.MultiTableStore
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"), col("embedding"))
    emb.count()
    val srcDir = graft.util.TempDirs.create("probe_s22_src").toString
    t("source stage write")(
      emb.where(col("id") >= 100).repartition(4)
        .write.mode("overwrite").parquet(s"$srcDir/files"))
    val path = graft.util.TempDirs.create("probe_s22_idx").toString + "/index"
    val st = t("seed build")(MultiTableStore.build(spark,
      emb.where(col("id") < 100), path,
      LshConfig(numHashFunctions = 4, numHashTables = 4, dim = 64,
        seed = 42L, multiTable = true)))
    // two adds over halves of the stream source — the two micro-batches
    val files = spark.read.parquet(s"$srcDir/files").inputFiles.sorted
    val (h1, h2) = files.splitAt(2)
    t("add batch 0")(st.add(spark.read.parquet(h1: _*), batchId = Some(0L)))
    t("add batch 1")(st.add(spark.read.parquet(h2: _*), batchId = Some(1L)))
    t("final exact search")(
      st.exact(graft.queries.VectorQueries.qvec(spark, sfDir, 0), 10).collect())
    // decompose one more add via a replayed batch id (no-op commit):
    // the replay check costs one FileLog.read
    t("replayed add (read+no-op)")(
      st.add(spark.read.parquet(h1.head), batchId = Some(0L)))
    // staged write of a raw batch (no encode), to split write vs encode
    val b2 = spark.read.parquet(h1.head)
    t("stagedWrite raw batch")(graft.store.FileLog.stagedWrite(spark, path,
      stage => b2.write.mode("overwrite").parquet(stage)))
    // the scatter write, three ways: as-is (tasks × 64 writers), with a
    // grid repartition (64 single-cell tasks), and coalesced narrow
    val enc2 = graft.store.MultiTableStore.testEncode(b2, st.model)
    val c1 = t("scatter write as-is")(graft.store.FileLog.stagedWrite(spark,
      path, stage => enc2.write.mode("overwrite")
        .partitionBy("table", "bucket").parquet(stage)))
    println(s"[probe]   files as-is: ${c1.size}")
    val c2 = t("scatter write repartition(grid)")(
      graft.store.FileLog.stagedWrite(spark, path, stage =>
        enc2.repartition(64, col("table"), col("bucket"))
          .write.mode("overwrite").partitionBy("table", "bucket").parquet(stage)))
    println(s"[probe]   files grid: ${c2.size}")
    spark.stop()
  }
}
