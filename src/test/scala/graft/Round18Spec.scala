package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.ManifestScan
import graft.store.{ConcurrentCommitException, FileLog,
  SnapshotVacuumedException, ZoneRange}

/** Round-18 incremental-recompute batteries:
  *
  *  1. CHANGE FEED semantics: appends surface as inserts, rewrites as
  *     row-level delete/insert diffs, compactions (dataChange=false)
  *     are skipped WITHOUT scanning, and the feed's scan cost is
  *     bounded by the changed files (pinned via inputFiles).
  *  2. Zone-pruned relational DELETE: only files whose zones can hold
  *     a match are rewritten; the rest are carried by reference.
  *  3. Read-set-scoped optimistic rewrites: two FILE-LOCAL deletes of
  *     disjoint file sets racing each other both land; overlapping
  *     read sets still fail loudly.
  *  4. Feed retention contract: a vacuumed version surfaces as the
  *     typed [[SnapshotVacuumedException]], never as a wrong feed.
  */
class Round18Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Cols = Seq("id", "grp")

  /** id, grp ('a'..), val — one file per appendBatch call. */
  private def batch(ids: Range, grp: String) = {
    val sess = spark
    import sess.implicits._
    ids.map(i => (i.toLong, grp, i.toLong * 10)).toDF("id", "grp", "v")
      .coalesce(1)
  }

  private def fresh(tag: String): String =
    graft.util.TempDirs.create(s"graft_r18_$tag").toString

  private def feedRows(dir: String, from: Int, to: Int) =
    ManifestScan.changes(spark, dir, from, to)
      .select("id", "grp", "v", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
      .toSet

  // -------------------------------------------------- feed semantics

  test("appends surface as inserts tagged with their commit version") {
    val dir = fresh("ins")
    ManifestScan.appendBatch(spark, dir, batch(1 to 3, "a"), Cols, 0L) // v1
    ManifestScan.appendBatch(spark, dir, batch(4 to 5, "b"), Cols, 1L) // v2
    val feed = feedRows(dir, 0, 2)
    assert(feed == Set(
      (1L, "a", 10L, "insert", 1L), (2L, "a", 20L, "insert", 1L),
      (3L, "a", 30L, "insert", 1L),
      (4L, "b", 40L, "insert", 2L), (5L, "b", 50L, "insert", 2L)))
    // a sub-range sees only its versions
    assert(feedRows(dir, 1, 2).forall(_._5 == 2L))
  }

  test("an append-only feed reads EXACTLY the added files") {
    val dir = fresh("bound")
    ManifestScan.appendBatch(spark, dir, batch(1 to 3, "a"), Cols, 0L) // v1
    ManifestScan.appendBatch(spark, dir, batch(4 to 5, "b"), Cols, 1L) // v2
    val v1 = FileLog.readVersion(dir, 1).files.toSet
    val v2 = FileLog.readVersion(dir, 2).files.toSet
    val added = (v2 -- v1).map(f => new java.net.URI(f).getPath)
    val scanned = ManifestScan.changes(spark, dir, 1, 2)
      .inputFiles.map(f => new java.net.URI(f).getPath).toSet
    assert(scanned == added) // never the whole table
  }

  test("compaction (dataChange=false) is skipped without scanning") {
    val dir = fresh("skip")
    ManifestScan.appendBatch(spark, dir, batch(1 to 4, "a"), Cols, 0L) // v1
    ManifestScan.appendBatch(spark, dir, batch(5 to 8, "b"), Cols, 1L) // v2
    ManifestScan.compact(spark, dir, "id", 1, Cols) // v3, row-neutral
    assert(FileLog.readVersion(dir, 3).dataChange === false)
    val feed = ManifestScan.changes(spark, dir, 2, 3)
    assert(feed.count() == 0)
    assert(feed.inputFiles.isEmpty) // skipped by flag, not by diffing
    // and the full-history feed is unchanged by the compaction
    assert(feedRows(dir, 0, 3).map(_._5).forall(v => v == 1L || v == 2L))
  }

  test("a rewrite diffs row-level: unchanged rows cancel, changes surface") {
    val dir = fresh("diff")
    ManifestScan.appendBatch(spark, dir, batch(1 to 4, "a"), Cols, 0L) // v1
    // hand-rolled upsert of id=2 (v -> 999): rewrite the one file
    val base = FileLog.read(dir)
    val created = FileLog.stagedWrite(spark, dir, stage =>
      spark.read.parquet(base.files: _*)
        .withColumn("v", when(col("id") === 2L, 999L).otherwise(col("v")))
        .coalesce(1).write.mode("overwrite").parquet(stage))
    FileLog.commitRewrite(spark, dir, base, base.files.toSet, created,
      base.schemaDdl) // v2
    val feed = feedRows(dir, 1, 2)
    assert(feed == Set(
      (2L, "a", 20L, "delete", 2L), // old image out
      (2L, "a", 999L, "insert", 2L))) // new image in — ids 1/3/4 cancel
  }

  test("a vacuumed feed version raises the typed retention error") {
    val dir = fresh("vac")
    // Enough versions that vacuum can DROP early records: the delta
    // log retains records down to the oldest survivor's checkpoint
    // (r21), so a record only disappears once it falls below that
    // chain floor — push the log past one checkpoint interval.
    val n = graft.store.FileLog.checkpointInterval + 4
    (1 to n).foreach { i =>
      ManifestScan.appendBatch(spark, dir,
        batch(i * 3 to i * 3 + 2, "g"), Cols, i - 1L) // v_i
    }
    ManifestScan.vacuum(spark, dir, retainLast = 2)
    assert(!graft.util.FsIo.exists(s"$dir/_files.v1.json"),
      "v1's record must fall below the survivors' chain floor")
    val e = intercept[SnapshotVacuumedException] {
      ManifestScan.changes(spark, dir, 0, n).count()
    }
    assert(e.getMessage.contains("change feed"))
    // the still-retained tail remains readable
    assert(feedRows(dir, n - 1, n).map(_._1) ==
      Set(n * 3L, n * 3L + 1, n * 3L + 2))
  }

  // ------------------------------------------- zone-pruned delete

  test("delete rewrites only zone-matching files; misses cost nothing") {
    val dir = fresh("del")
    ManifestScan.appendBatch(spark, dir, batch(1 to 4, "a"), Cols, 0L) // v1
    ManifestScan.appendBatch(spark, dir, batch(5 to 8, "b"), Cols, 1L) // v2
    val before = FileLog.read(dir)
    val n = ManifestScan.delete(spark, dir,
      Map("grp" -> ZoneRange.StrR("b", "b"), "id" -> ZoneRange.I64R(5L, 6L)),
      Cols) // v3
    assert(n == 2L)
    val after = FileLog.read(dir)
    // the 'a' file was provably disjoint: carried by REFERENCE
    val aFile = before.files.filter(f =>
      before.zones(f)("grp") == graft.store.Zone.Str("a", "a"))
    assert(aFile.nonEmpty && aFile.forall(after.files.contains))
    assert(spark.read.parquet(after.files: _*).count() == 6)
    // a delete that provably matches nothing commits NO version
    val v = FileLog.read(dir).version
    assert(ManifestScan.delete(spark, dir,
      Map("id" -> ZoneRange.I64R(100L, 200L)), Cols) == 0L)
    assert(FileLog.read(dir).version == v)
    // and the feed shows exactly the deleted rows' old images
    assert(feedRows(dir, 2, 3) == Set(
      (5L, "b", 50L, "delete", 3L), (6L, "b", 60L, "delete", 3L)))
  }

  // ---------------------------------------------- merge-style upsert

  test("upsert replaces matched keys, inserts the rest, prunes by zone") {
    val sess = spark
    import sess.implicits._
    val dir = fresh("ups")
    ManifestScan.appendBatch(spark, dir, batch(1 to 4, "a"), Cols, 0L) // v1
    ManifestScan.appendBatch(spark, dir, batch(5 to 8, "b"), Cols, 1L) // v2
    val before = FileLog.read(dir)
    // id 6 replaced (twice in the batch: LAST wins), id 99 inserted —
    // key envelope [6, 99] misses the 'a' file's [1, 4] zone
    val (nRep, nIns) = ManifestScan.upsert(spark, dir,
      Seq((6L, "b", 111L), (6L, "b", 666L), (99L, "c", 990L))
        .toDF("id", "grp", "v"), "id", Cols)
    assert(nRep == 1L && nIns == 1L)
    val after = FileLog.read(dir)
    val aFile = before.files.filter(f =>
      before.zones(f)("grp") == graft.store.Zone.Str("a", "a"))
    assert(aFile.forall(after.files.contains)) // provably unmatched: kept
    val rows = ManifestScan.readPrunedRanges(spark, dir, Map.empty)._1
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(rows(6L) == 666L && rows(99L) == 990L && rows.size == 9)
    // the feed shows the upsert as old-image deletes + new-image inserts
    assert(feedRows(dir, 2, 3) == Set(
      (6L, "b", 60L, "delete", 3L),
      (6L, "b", 666L, "insert", 3L), (99L, "c", 990L, "insert", 3L)))
  }

  test("an upsert batch may widen the schema (evolution through merge)") {
    val sess = spark
    import sess.implicits._
    val dir = fresh("upsevo")
    ManifestScan.appendBatch(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "grp").coalesce(1), Cols, 0L)
    val (nRep, nIns) = ManifestScan.upsert(spark, dir,
      Seq((2L, "b", 22L)).toDF("id", "grp", "v"), "id", Cols)
    assert(nRep == 1L && nIns == 0L)
    val rows = ManifestScan.readPrunedRanges(spark, dir, Map.empty)._1
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows == Set((1L, -1L), (2L, 22L)))
  }

  // ------------------------- read-set-scoped optimistic rewrites

  test("two deletes of DISJOINT file sets racing: both land") {
    val dir = fresh("race")
    ManifestScan.appendBatch(spark, dir, batch(1 to 4, "a"), Cols, 0L) // v1
    ManifestScan.appendBatch(spark, dir, batch(5 to 8, "b"), Cols, 1L) // v2
    // writer B pins its snapshot and stages its rewrite of the 'b'
    // file BEFORE writer A commits
    val baseB = FileLog.read(dir)
    val bFiles = baseB.files.filter(f =>
      baseB.zones(f)("grp") == graft.store.Zone.Str("b", "b")).toSet
    val createdB = FileLog.stagedWrite(spark, dir, stage =>
      spark.read.parquet(bFiles.toSeq: _*).where(col("id") =!= 5L)
        .coalesce(1).write.mode("overwrite").parquet(stage))
    // writer A deletes in the 'a' file and commits first (v3)
    assert(ManifestScan.delete(spark, dir,
      Map("grp" -> ZoneRange.StrR("a", "a"), "id" -> ZoneRange.I64R(1L, 1L)),
      Cols) == 1L)
    // writer B commits against its now-stale base, declaring its
    // file-local read set: MERGES (v4) — disjoint rewrites commute
    FileLog.commitRewrite(spark, dir, baseB, bFiles, createdB,
      baseB.schemaDdl, readSet = Some(bFiles))
    val rows = spark.read.parquet(FileLog.read(dir).files: _*)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rows == Set(2L, 3L, 4L, 6L, 7L, 8L)) // both deletes applied
  }

  test("two rewrites with OVERLAPPING read sets still fail loudly") {
    val dir = fresh("conflict")
    ManifestScan.appendBatch(spark, dir, batch(1 to 4, "a"), Cols, 0L) // v1
    val base = FileLog.read(dir)
    val created = FileLog.stagedWrite(spark, dir, stage =>
      spark.read.parquet(base.files: _*).where(col("id") =!= 2L)
        .coalesce(1).write.mode("overwrite").parquet(stage))
    // an overlapping delete wins the race (rewrites the same file)
    assert(ManifestScan.delete(spark, dir,
      Map("id" -> ZoneRange.I64R(3L, 3L)), Cols) == 1L)
    intercept[ConcurrentCommitException] {
      FileLog.commitRewrite(spark, dir, base, base.files.toSet, created,
        base.schemaDdl, readSet = Some(base.files.toSet))
    }
    // removed must be inside the declared read set (caller bug guard)
    intercept[IllegalArgumentException] {
      FileLog.commitRewrite(spark, dir, FileLog.read(dir),
        FileLog.read(dir).files.toSet, Seq.empty, base.schemaDdl,
        readSet = Some(Set.empty))
    }
  }

  // ----------------------------------------- feed-driven index sync

  test("an index tracks an upstream table by consuming its change feed") {
    val dir = fresh("sync_tbl")
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id").as("id"), col("embedding"))
    ManifestScan.appendBatch(spark, dir,
      emb.where(col("id") < 300), Seq("id"), 0L) // v1
    val store = graft.store.VectorStore.build(spark,
      ManifestScan.readPrunedAsOf(spark, dir, 1, Map.empty)._1,
      s"${fresh("sync_idx")}/index",
      graft.lsh.LshConfig(dim = 64, seed = 18L))
    // upstream moves on: append (v2), compact (v3, feed-invisible),
    // zone-pruned delete of ids 0..49 (v4)
    ManifestScan.appendBatch(spark, dir,
      emb.where(col("id") >= 300), Seq("id"), 1L) // v2
    ManifestScan.compact(spark, dir, "id", 2, Seq("id")) // v3
    ManifestScan.delete(spark, dir,
      Map("id" -> ZoneRange.I64R(0L, 49L)), Seq("id")) // v4
    val (nUp, nDel) =
      store.applyChanges(ManifestScan.changes(spark, dir, 1, 4))
    assert(nUp == 200L && nDel == 50L)
    // the synced index holds exactly the upstream table's final ids
    val want = ManifestScan.readPrunedRanges(spark, dir, Map.empty)._1
      .select("id").collect().map(_.getLong(0)).toSet
    val got = store.indexDf.select("id").collect()
      .map(_.getLong(0)).toSet
    assert(got == want && want.size == 450)
    // replaying a wider feed window is idempotent (net actions)
    val (nUp2, nDel2) =
      store.applyChanges(ManifestScan.changes(spark, dir, 1, 4))
    assert(nUp2 == 200L && nDel2 == 0L) // deletes already gone
    assert(store.indexDf.count() == 450)
  }

  // ------------------------------------------------ schema evolution

  test("widening append evolves the schema; old files read as nulls") {
    val sess = spark
    import sess.implicits._
    val dir = fresh("evo")
    ManifestScan.appendBatch(spark, dir,
      Seq((1L, "a"), (2L, "a")).toDF("id", "grp").coalesce(1),
      Cols, 0L) // v1: narrow
    ManifestScan.appendBatch(spark, dir,
      Seq((3L, "b", 30L)).toDF("id", "grp", "v").coalesce(1),
      Cols, 1L) // v2: widened with v
    assert(FileLog.read(dir).schemaDdl.contains("v"))
    val rows = ManifestScan.readPrunedRanges(spark, dir, Map.empty)._1
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows == Set((1L, -1L), (2L, -1L), (3L, 30L)))
    // the feed reads EVERY version in the evolved shape: v1's
    // inserts surface the post-evolution column as null
    val feed = ManifestScan.changes(spark, dir, 0, 2)
    assert(feed.where(col("_commit_version") === 1L && col("v").isNull)
      .count() == 2)
    assert(feed.count() == 3)
    // time travel keeps v1's ORIGINAL schema (no v column yet)
    assert(!ManifestScan.readPrunedAsOf(spark, dir, 1, Map.empty)._1
      .columns.contains("v"))
  }

  test("narrowing or retyping appends are refused before writing") {
    val sess = spark
    import sess.implicits._
    val dir = fresh("evoguard")
    ManifestScan.appendBatch(spark, dir,
      Seq((1L, "a", 10L)).toDF("id", "grp", "v").coalesce(1), Cols, 0L)
    val filesBefore = FileLog.listDataFiles(spark, dir).size
    intercept[IllegalArgumentException] { // drops column v
      ManifestScan.appendBatch(spark, dir,
        Seq((2L, "b")).toDF("id", "grp").coalesce(1), Cols, 1L)
    }
    intercept[IllegalArgumentException] { // retypes v to string
      ManifestScan.appendBatch(spark, dir,
        Seq((2L, "b", "x")).toDF("id", "grp", "v").coalesce(1), Cols, 1L)
    }
    // fail-fast: the refused batches never staged files into the tree
    assert(FileLog.listDataFiles(spark, dir).size == filesBefore)
    assert(FileLog.read(dir).version == 1)
  }

  test("delete and compact operate on the evolved shape") {
    val sess = spark
    import sess.implicits._
    val dir = fresh("evomut")
    ManifestScan.appendBatch(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "grp").coalesce(1), Cols, 0L)
    ManifestScan.appendBatch(spark, dir,
      Seq((3L, "b", 30L)).toDF("id", "grp", "v").coalesce(1), Cols, 1L)
    // compact merges mixed-schema generations, materializing nulls
    ManifestScan.compact(spark, dir, "id", 1, Cols)
    assert(ManifestScan.delete(spark, dir,
      Map("id" -> ZoneRange.I64R(2L, 2L)), Cols) == 1L)
    val rows = ManifestScan.readPrunedRanges(spark, dir, Map.empty)._1
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows == Set((1L, -1L), (3L, 30L)))
  }

  // ------------------------------------------- region compaction

  test("compactWhere compacts only the targeted region; feed skips it") {
    val dir = fresh("cw")
    Seq("a", "b", "c", "d").zipWithIndex.foreach { case (g, i) =>
      ManifestScan.appendBatch(spark, dir,
        batch(i * 4 + 1 to i * 4 + 4, g), Cols, i.toLong) // v1..v4
    }
    val before = FileLog.read(dir)
    val (touched, after) = ManifestScan.compactWhere(spark, dir,
      Map("grp" -> ZoneRange.StrR("a", "b")), "id", 1, Cols) // v5
    assert(touched == 2 && after == 1)
    val cur = FileLog.read(dir)
    assert(cur.files.size == 3) // 1 merged + c and d by reference
    val cdFiles = before.files.filter { f =>
      val z = before.zones(f)("grp")
      z == graft.store.Zone.Str("c", "c") || z == graft.store.Zone.Str("d", "d")
    }
    assert(cdFiles.size == 2 && cdFiles.forall(cur.files.contains))
    assert(!cur.dataChange) // row-neutral: the feed skips it unscanned
    val feed = ManifestScan.changes(spark, dir, 4, 5)
    assert(feed.count() == 0 && feed.inputFiles.isEmpty)
    assert(ManifestScan.readPrunedRanges(spark, dir, Map.empty)._1
      .count() == 16)
  }

  test("two region compactions of DISJOINT regions race: both land") {
    val dir = fresh("cwrace")
    Seq("a", "b", "c", "d").zipWithIndex.foreach { case (g, i) =>
      ManifestScan.appendBatch(spark, dir,
        batch(i * 4 + 1 to i * 4 + 4, g), Cols, i.toLong) // v1..v4
    }
    // the RIGHT-region compaction pins its snapshot and stages first
    val baseB = FileLog.read(dir)
    val rightFiles = baseB.files.filter { f =>
      val z = baseB.zones(f)("grp")
      z == graft.store.Zone.Str("c", "c") || z == graft.store.Zone.Str("d", "d")
    }.toSet
    val createdB = FileLog.stagedWrite(spark, dir, stage =>
      spark.read.parquet(rightFiles.toSeq: _*)
        .coalesce(1).write.mode("overwrite").parquet(stage))
    // LEFT region compacts and commits first (v5)...
    ManifestScan.compactWhere(spark, dir,
      Map("grp" -> ZoneRange.StrR("a", "b")), "id", 1, Cols)
    // ...RIGHT commits against its stale base, declaring its region
    // as the read set: disjoint regions commute, both land (v6)
    FileLog.commitRewrite(spark, dir, baseB, rightFiles, createdB,
      baseB.schemaDdl, dataChange = false, readSet = Some(rightFiles))
    val cur = FileLog.read(dir)
    assert(cur.files.size == 2) // left-merged + right-merged
    assert(spark.read.parquet(cur.files: _*).select("id")
      .collect().map(_.getLong(0)).toSet == (1L to 16L).toSet)
  }

  // ------------------------------- tri-layout feed sync parity

  test("quantized and multi-table layouts sync from the same feed") {
    val dir = fresh("sync3_tbl")
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id").as("id"), col("embedding"))
    ManifestScan.appendBatch(spark, dir,
      emb.where(col("id") < 300), Seq("id"), 0L) // v1
    val atV1 = ManifestScan.readPrunedAsOf(spark, dir, 1, Map.empty)._1
    val quant = graft.store.QuantIndex.build(spark, atV1,
      s"${fresh("sync3_q")}/index", graft.store.QuantConfig())
    val mt = graft.store.MultiTableStore.build(spark, atV1,
      s"${fresh("sync3_mt")}/index",
      graft.lsh.LshConfig(numHashFunctions = 4, numHashTables = 4,
        dim = 64, seed = 18L, multiTable = true))
    ManifestScan.appendBatch(spark, dir,
      emb.where(col("id") >= 300), Seq("id"), 1L) // v2
    ManifestScan.delete(spark, dir,
      Map("id" -> ZoneRange.I64R(0L, 49L)), Seq("id")) // v3
    val want = ManifestScan.readPrunedRanges(spark, dir, Map.empty)._1
      .select("id").collect().map(_.getLong(0)).toSet
    def feed() = ManifestScan.changes(spark, dir, 1, 3)
    val (qUp, qDel) = quant.applyChanges(feed())
    assert(qUp == 200L && qDel == 50L)
    assert(quant.indexDf.select("id").collect()
      .map(_.getLong(0)).toSet == want)
    val (mUp, mDel) = mt.applyChanges(feed())
    assert(mUp == 200L && mDel == 50L)
    assert(mt.indexDf.select("id").distinct().collect()
      .map(_.getLong(0)).toSet == want)
  }

  // -------------------------------------------- mixed-writer chaos

  test("mixed concurrent writers: zero row loss, feed reconstructs state") {
    val dir = fresh("chaos")
    // seed: 8 single-file batches with tight grp zones (v1..v8)
    val seedGrps = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    seedGrps.zipWithIndex.foreach { case (g, i) =>
      ManifestScan.appendBatch(spark, dir,
        batch(i * 4 + 1 to i * 4 + 4, g), Cols, i.toLong)
    }
    // four writers race: more appends, two single-grp deletes, a
    // region compaction OVERLAPPING one delete's region. Rewrites
    // retry on ConcurrentCommitException (the documented contract);
    // appends and disjoint-read-set rewrites merge on their own.
    def retrying[T](body: => T): T = {
      var out: Option[T] = None
      while (out.isEmpty) {
        try out = Some(body)
        catch { case _: ConcurrentCommitException => Thread.sleep(10) }
      }
      out.get
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(
      new Thread(() => (0 until 4).foreach { i => // appends i..l
        ManifestScan.appendBatch(spark, dir,
          batch(100 + i * 4 + 1 to 100 + i * 4 + 4, ('i' + i).toChar.toString),
          Cols, 100L + i)
      }),
      new Thread(() => retrying {
        ManifestScan.delete(spark, dir,
          Map("grp" -> ZoneRange.StrR("b", "b")), Cols)
      }: Unit),
      new Thread(() => retrying {
        ManifestScan.delete(spark, dir,
          Map("grp" -> ZoneRange.StrR("f", "f")), Cols)
      }: Unit),
      new Thread(() => retrying {
        ManifestScan.compactWhere(spark, dir,
          Map("grp" -> ZoneRange.StrR("a", "d")), "id", 1, Cols)
      }: Unit)
    ).map { t =>
      t.setUncaughtExceptionHandler((_, e) => { errs.add(e); () })
      t.start(); t
    }
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"writer died: ${Option(errs.peek()).map(_.toString)}")
    // final state is deterministic regardless of interleaving: every
    // seed grp except the two deleted, plus all appended grps
    val want = (seedGrps.zipWithIndex.filterNot(g => g._1 == "b" || g._1 == "f")
      .flatMap { case (_, i) => (i * 4 + 1) to (i * 4 + 4) } ++
      (0 until 4).flatMap(i => (100 + i * 4 + 1) to (100 + i * 4 + 4)))
      .map(_.toLong).toSet
    val cur = FileLog.read(dir)
    val got = spark.read.parquet(cur.files: _*)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want, "physical row loss or resurrection under race")
    // and the CHANGE FEED replays the whole racy history to the same
    // state: net per-id actions over (0, head] must equal the table
    val (ins, dels) = graft.store.FeedSync.net(
      ManifestScan.changes(spark, dir, 0, cur.version), "id", "grp")
    val feedIds = ins.select("id").collect().map(_.getLong(0)).toSet
    assert(feedIds == want, "feed-reconstructed state diverges")
    assert(dels.collect().map(_.getLong(0)).toSet ==
      (seedGrps.indexOf("b") * 4 + 1 to seedGrps.indexOf("b") * 4 + 4)
        .map(_.toLong).toSet ++
      (seedGrps.indexOf("f") * 4 + 1 to seedGrps.indexOf("f") * 4 + 4)
        .map(_.toLong).toSet)
  }

  // ------------------------------------ incremental view maintenance

  test("incremental aggregate refresh equals full recompute") {
    val dir = fresh("ivm")
    ManifestScan.appendBatch(spark, dir, batch(1 to 4, "a"), Cols, 0L) // v1
    ManifestScan.appendBatch(spark, dir, batch(5 to 8, "b"), Cols, 1L) // v2
    val mat = ManifestScan.readPrunedAsOf(spark, dir, 2, Map.empty)._1
      .groupBy("grp").agg(count(lit(1)).as("n0"), sum("v").as("s0"))
    ManifestScan.appendBatch(spark, dir, batch(9 to 10, "c"), Cols, 2L) // v3
    ManifestScan.compact(spark, dir, "id", 2, Cols) // v4
    ManifestScan.delete(spark, dir,
      Map("grp" -> ZoneRange.StrR("a", "a")), Cols) // v5
    val delta = ManifestScan.changes(spark, dir, 2, 5)
      .withColumn("sgn",
        when(col("_change_type") === "insert", 1L).otherwise(-1L))
      .groupBy("grp")
      .agg(sum(col("sgn")).as("dn"), sum(col("sgn") * col("v")).as("ds"))
    val refreshed = mat.join(delta, Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s0"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .where(col("n") > 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = spark.read.parquet(FileLog.read(dir).files: _*)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(refreshed == full)
    assert(refreshed.map(_._1) == Set("b", "c")) // 'a' emptied and dropped
  }
}
