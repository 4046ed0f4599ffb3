package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.ManifestScan
import graft.store.{FileLog, ZoneRange}

/** Change-feed scale smoke: at bench sf the x34 refresh pair is
  * job-floor-bound (documented in Bench), so THIS is where the
  * incremental-recompute claim gets its wall-clock evidence — a
  * 16M-row table where a full rescan is genuinely data-bound (the
  * incremental fold has its own ~0.5 s multi-stage shuffle floor —
  * exceptAll + groupBy + join — measured at 4M, where the two paths
  * tie; 16M puts the rescan decisively past it):
  *
  *  1. the feed's scan set is the CHANGED files only (exact
  *     inputFiles pin — the property that scales to 100 TB);
  *  2. folding the feed into a materialized aggregate beats the full
  *     recompute on wall-clock (median-of-3 on both sides);
  *  3. the refreshed aggregate equals the recomputed one exactly.
  *
  * Layout mirrors a real ingest: id-range-clustered files (every file
  * owns a tight id zone), a small appended delta, and a zone-pruned
  * delete touching one file.
  */
class FeedScaleSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val N = 16000000L
  private val Files = 128

  private def median3(body: => Unit): Double = {
    body // untimed warm-up
    Seq.fill(3) {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.sorted.apply(1)
  }

  test("16M-row table: feed reads only changed files and refresh beats rescan") {
    val dir = graft.util.TempDirs.create("graft_feedscale").toString
    val base = spark.range(N).select(col("id"),
      pmod(col("id"), lit(997)).as("grp"), (col("id") * 3).as("v"))
    // v1: the bulk load, range-clustered so every file owns an id zone
    base.repartitionByRange(Files, col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(dir)
    ManifestScan.buildManifest(spark, dir, Seq("id", "grp"))
    // the materialized view, pinned at v1
    val mat = ManifestScan.readPrunedAsOf(spark, dir, 1, Map.empty)._1
      .groupBy("grp").agg(count(lit(1)).as("n0"), sum("v").as("s0"))
      .localCheckpoint(true)
    // v2: a 50k-row appended delta; v3: a delete inside ONE file's zone
    ManifestScan.appendBatch(spark, dir,
      spark.range(N, N + 50000).select(col("id"),
        pmod(col("id"), lit(997)).as("grp"), (col("id") * 3).as("v"))
        .coalesce(1), Seq("id", "grp"), 0L)
    val nDel = ManifestScan.delete(spark, dir,
      Map("id" -> ZoneRange.I64R(1000L, 3000L)), Seq("id", "grp"))
    assert(nDel == 2001L)
    val head = FileLog.read(dir).version
    assert(head == 3)

    // 1. scan-set pin: the feed reads the appended file + the delete
    //    diff's old/new files — never the other ~31 bulk files
    def feed() = ManifestScan.changes(spark, dir, 1, head)
    val v2files = FileLog.readVersion(dir, 2).files.toSet
    val v1files = FileLog.readVersion(dir, 1).files.toSet
    val v3files = FileLog.readVersion(dir, 3).files.toSet
    val changed = (v2files -- v1files) ++ // the appended file
      (v2files -- v3files) ++ (v3files -- v2files) // delete old+new
    val scanned = feed().inputFiles
      .map(f => new java.net.URI(f).getPath).toSet
    assert(scanned == changed.map(f => new java.net.URI(f).getPath))
    assert(scanned.size <= 4 && v3files.size >= Files,
      s"feed scanned ${scanned.size} files of ${v3files.size}")

    // 2 + 3. incremental refresh: correct and faster than rescan
    def incremental() = mat
      .join(feed()
        .withColumn("sgn",
          when(col("_change_type") === "insert", 1L).otherwise(-1L))
        .groupBy("grp")
        .agg(sum(col("sgn")).as("dn"), sum(col("sgn") * col("v")).as("ds")),
        Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s0"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .where(col("n") > 0)
    def full() = ManifestScan.readPrunedRanges(spark, dir, Map.empty)._1
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val inc = incremental().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rec = full().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == rec, "incremental refresh diverged from recompute")
    val tInc = median3(incremental().collect())
    val tFull = median3(full().collect())
    info(f"refresh: incremental=$tInc%.3fs full=$tFull%.3fs " +
      f"(files ${scanned.size} vs ${v3files.size})")
    assert(tInc < tFull,
      f"at 16M rows the delta fold ($tInc%.3fs) must beat the full " +
        f"rescan ($tFull%.3fs)")
  }
}
