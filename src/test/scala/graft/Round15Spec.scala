package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.HeavyHittersAgg
import graft.sources.ManifestScan

/** Round-15 internals: the Misra-Gries guarantee under adversarial
  * partitioning (the DuckDB gate only sees the exact twin + flag) and
  * the streaming manifest's maintenance contract.
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    queries.Registry.all.find(_.name == name).get.run(spark, TestSpark.sf)

  /** Synthetic skewed stream with EXACT known counts: key k appears
    * 2^(10-k) times for k=0..9 (1024..2) plus 500 singleton keys.
    */
  private def skewed(parts: Int) = {
    import spark.implicits._
    val items = (0 to 9).flatMap(k => Seq.fill(1 << (10 - k))(k.toLong)) ++
      (1000L until 1500L)
    items.toDF("k").repartition(parts)
  }

  test("MG sketch: lower bounds + n/(m+1) undercount under any partitioning") {
    val trueCounts = ((0 to 9).map(k => k.toLong -> (1L << (10 - k))) ++
      (1000L until 1500L).map(_ -> 1L)).toMap
    val n = trueCounts.values.sum
    for (parts <- Seq(1, 2, 7)) {
      val m = 10
      val sk = skewed(parts).agg(HeavyHittersAgg(col("k"), m))
        .head.getMap[Long, Long](0)
      assert(sk.size <= m)
      val bound = n / (m + 1)
      // every estimate is a lower bound within the theorem's slack
      for ((k, est) <- sk) {
        assert(est <= trueCounts(k), s"parts=$parts: overcount on $k")
        assert(trueCounts(k) - est <= bound,
          s"parts=$parts: undercount ${trueCounts(k) - est} > $bound on $k")
      }
      // every key with true count > n/(m+1) survives every merge tree
      for ((k, c) <- trueCounts if c > bound)
        assert(sk.contains(k), s"parts=$parts: lost heavy hitter $k ($c > $bound)")
    }
  }

  test("r83 output is the exact top-10, flags all 1, rerun-identical") {
    val out = q("r83_heavy_hitters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.length == 10)
    assert(out.forall(_._3 == 1))
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(-_).toSeq)
    val again = q("r83_heavy_hitters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("s26 stream maintains the manifest: complete, incremental, pruning") {
    // run the query end-to-end; it returns the pruned-read aggregate
    val out = q("s26_stream_manifest_ingest").collect()
    assert(out.length == 1)
    // replicate the ingest to inspect the sidecar contract directly
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 3600000000000").as("hour_bucket"),
        col("value"))
    val dir = graft.util.TempDirs.create("graft_r15_s26").toString
    ev.where(col("user_id") % 2 === 0)
      .repartitionByRange(4, col("user_id"))
      .write.mode("append").parquet(dir)
    val first = ManifestScan.refreshManifest(spark, dir,
      Seq("user_id", "hour_bucket"))
    assert(first >= 1)
    // idempotent: nothing new → zero footer reads, manifest unchanged
    assert(ManifestScan.refreshManifest(spark, dir,
      Seq("user_id", "hour_bucket")) == 0)
    val before = ManifestScan.loadManifest(dir).map(_.path).toSet
    ev.where(col("user_id") % 2 === 1)
      .repartitionByRange(4, col("user_id"))
      .write.mode("append").parquet(dir)
    val second = ManifestScan.refreshManifest(spark, dir,
      Seq("user_id", "hour_bucket"))
    assert(second >= 1)
    val after = ManifestScan.loadManifest(dir)
    // old entries preserved verbatim, new files all indexed
    assert(before.subsetOf(after.map(_.path).toSet))
    def norm(p: String) = new java.net.URI(p).getPath
    val listed = spark.read.parquet(dir).inputFiles.map(norm).toSet
    assert(after.map(e => norm(e.path)).toSet == listed,
      s"manifest ${after.size} entries vs ${listed.size} files")
    // the appended table still answers pruned reads exactly
    val zones = after.flatMap(_.zones.get("user_id"))
      .collect { case graft.store.Zone.I64(l, h) => (l, h) }.sortBy(_._1)
    val (lo, hi) = zones.head
    val (df, kept, total) = ManifestScan.readPruned(spark, dir,
      Map("user_id" -> (lo, hi)))
    assert(kept > 0 && kept <= total)
    val full = spark.read.parquet(dir).where(col("user_id").between(lo, hi))
    assert(df.count() == full.count())
  }

  private def evCols = Seq("user_id", "hour_bucket")

  private def writeHalves(dir: String): Unit = {
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 3600000000000").as("hour_bucket"),
        col("value"))
    ev.where(col("user_id") % 2 === 0)
      .repartitionByRange(4, col("user_id"))
      .write.mode("append").parquet(dir)
    ManifestScan.refreshManifest(spark, dir, evCols) // v1
    ev.where(col("user_id") % 2 === 1)
      .repartitionByRange(4, col("user_id"))
      .write.mode("append").parquet(dir)
    ManifestScan.refreshManifest(spark, dir, evCols) // v2
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("x29 compact: same rows, fewer files, old versions keep their snapshot") {
    val dir = graft.util.TempDirs.create("graft_r15_x29").toString
    writeHalves(dir)
    val all = Map("user_id" -> (Long.MinValue, Long.MaxValue))
    val preRows = rowsOf(ManifestScan.readPruned(spark, dir, all)._1)
    val preV = ManifestScan.versions(spark, dir)
    val (before, after) = ManifestScan.compact(spark, dir, "user_id", 2, evCols)
    assert(after < before, s"compacted $before -> $after files")
    assert(rowsOf(ManifestScan.readPruned(spark, dir, all)._1) == preRows)
    // every retained pre-compact version still reads its exact snapshot
    val v1Rows = rowsOf(ManifestScan.readPrunedAsOf(spark, dir, preV.head, all)._1)
    assert(v1Rows.forall(_._1 % 2 == 0) && v1Rows.nonEmpty)
    assert(rowsOf(ManifestScan.readPrunedAsOf(spark, dir, preV.last, all)._1)
      == preRows)
    assert(ManifestScan.versions(spark, dir).size == preV.size + 1)
  }

  test("x30 vacuum: drops history, never a referenced file, current stays exact") {
    val dir = graft.util.TempDirs.create("graft_r15_vac").toString
    writeHalves(dir)
    ManifestScan.compact(spark, dir, "user_id", 2, evCols) // v3
    val all = Map("user_id" -> (Long.MinValue, Long.MaxValue))
    val preRows = rowsOf(ManifestScan.readPruned(spark, dir, all)._1)
    val deleted = ManifestScan.vacuum(spark, dir, retainLast = 1)
    assert(deleted >= 1, "vacuum reclaimed nothing after a compaction")
    assert(ManifestScan.versions(spark, dir).size == 1)
    // current reads are untouched...
    assert(rowsOf(ManifestScan.readPruned(spark, dir, all)._1) == preRows)
    // ...and the directory holds EXACTLY the referenced files now
    def norm(p: String) = new java.net.URI(p).getPath
    val onDisk = spark.read.parquet(
      ManifestScan.loadManifest(dir).map(_.path): _*).inputFiles.map(norm).toSet
    val listed = {
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sessionState.newHadoopConf())
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") &&
          !p.getName.startsWith("_"))
        .map(p => norm(p.toString)).toSet
    }
    assert(listed == onDisk, "orphan data files survived vacuum")
    // idempotent
    assert(ManifestScan.vacuum(spark, dir, retainLast = 1) == 0)
  }
}
