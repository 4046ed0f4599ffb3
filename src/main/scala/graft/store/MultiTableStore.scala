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
  * '''When to choose this layout''' (measured guidance, post-bucket-fix
  * — REPORT.md storage-vs-recall table, pinned in MultiTableLshSpec):
  * at 64 dimensions on this corpus family the 4×16 multi-table layout
  * edges out a fixed mod-16 single-table layout by only ~1–5 recall
  * points at equal probed fraction, while storing '''×L copies''' of
  * every row — recall per stored byte favors mod-N + a larger probe
  * budget at EVERY operating point measured. Prefer the default
  * single-table [[VectorStore]] (more probes are free at query time;
  * storage is not) unless (a) probe latency dominates and storage is
  * cheap, or (b) the recall curve audit on YOUR corpus/dim shows the
  * OR-union gap widening (high-dim, highly clustered corpora — where
  * multi-table theory earns its keep). [[auditRecallCurve]] +
  * [[searchAtRecall]] make that comparison a measurement, not a guess.
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

  /** The live ×L index, read through the [[FileLog]] — same
    * snapshot-isolation contract as [[VectorStore.indexDf]]: readers
    * resolve a committed file list, never a directory listing that a
    * concurrent rewrite can tear.
    */
  def indexDf: DataFrame =
    if (!FileLog.exists(path)) spark.read.parquet(path)
    else dfOf(FileLog.read(path))

  private def dfOf(st: FileLog.State): DataFrame =
    if (st.files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(st.schemaDdl))
    else spark.read.option("basePath", path).parquet(st.files: _*)

  /** Pinned snapshot + frame for read-modify-write mutations; adopts
    * unlogged directories (see [[VectorStore]]'s twin).
    */
  private def pinned(): (FileLog.State, DataFrame) =
    if (FileLog.exists(path)) {
      val st = FileLog.read(path)
      (st, dfOf(st))
    } else {
      val phys = FileLog.listDataFiles(spark, path)
      val df = spark.read.option("basePath", path).parquet(path)
      (FileLog.State(phys, df.schema.toDDL, version = 0), df)
    }

  private def partOfFile(f: String): Option[(Int, Int)] =
    MultiTableStore.PartRe.findFirstMatchIn(f)
      .map(m => (m.group(1).toInt, m.group(2).toInt))

  /** Predicate selecting the probed (table, bucket) partitions —
    * OR-of-ANDs over the two partition columns, so the scan prunes to
    * exactly the probed directories.
    */
  def pruneFilter(q: Array[Double], probes: Int): Column =
    model.tableCandidates(q, probes)
      .map { case (t, b) => col("table") === t && col("bucket") === b }
      .reduce(_ || _)

  /** Pruned kNN: probed partitions → id-dedup → exact top-k. */
  /** Eager-action wrapper delivering the typed vacuum-race error
    * ([[FileLog.classified]]) — see [[VectorStore.classified]].
    */
  def classified[T](body: => T): T = FileLog.classified(path)(body)

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
          embCol: String = "embedding",
          batchId: Option[Long] = None): Unit = {
    val bid = batchId.getOrElse(-1L)
    if (bid >= 0 && FileLog.exists(path) && FileLog.read(path).batchId >= bid)
      return // replayed streaming batch: already committed (exactly-once)
    val encoded = MultiTableStore.encode(df, model, idCol, embCol)
    // staged write + read-merge-CAS append: concurrent adds can't share
    // scratch dirs and both land; unlogged dirs are adopted (r10
    // ADVICE). Pre-write exchange to the table×bucket grid,
    // unconditionally (r15): bounds a wide append at ≤ grid files AND
    // gives narrow micro-batches grid-way write parallelism — without
    // it a 1-partition batch writes all ~64 touched partitions'
    // files sequentially in one task (measured 1.6 → 1.2 s per
    // scatter); the batch-sized exchange is noise next to either.
    val grid = model.cfg.numHashTables * model.bucketsPerTable
    val out = encoded.repartition(grid, col("table"), col("bucket"))
    val created = FileLog.stagedWrite(spark, path, stage =>
      out.write.mode("overwrite").partitionBy("table", "bucket").parquet(stage))
    FileLog.transact(spark, path) { cur =>
      val curBid = cur.map(_.batchId).getOrElse(-1L)
      if (bid >= 0 && curBid >= bid) None
      else Some(FileLog.Commit(
        cur.map(_.files).getOrElse(
          FileLog.listDataFiles(spark, path).filterNot(created.toSet))
          ++ created,
        out.schema.toDDL, math.max(bid, curBid),
        cur.map(_.zones).getOrElse(Map.empty),
        cur.map(_.rows).getOrElse(Map.empty)))
    }
    invalidateRecallCurve()
  }

  // ------------------------------------------- recall-targeted search

  /** Measure the recall-vs-probes curve for [[search]] over a query
    * panel and persist it next to the index — [[VectorStore
    * .auditRecallCurve]] on the multi-table layout, where a "probe"
    * is one (table, bucket) pair reading ~2^-k of one corpus copy.
    * ONE corpus scan: the panel broadcasts into the scan with each
    * query's full ordered candidate list (prefix-closed by
    * construction — [[graft.lsh.LshModel.tableCandidates]] fills an
    * insertion-ordered set), the exact arm is a table-0-restricted
    * FILTERed TopKAgg, and depth-p membership is one array_position
    * test on the t·2^k+b pair code. Unlike the single-table layout,
    * informed candidates need not cover every partition, so the curve
    * may top out below 1.0 — [[searchAtRecall]] then degenerates to
    * [[exact]] for targets above it (never under-deliver).
    */
  def auditRecallCurve(panel: Seq[Array[Double]], k: Int = 10,
                       maxProbes: Int = 0): Seq[Double] = {
    require(panel.nonEmpty, "empty audit panel")
    val kk = math.max(1, k)
    val mp = if (maxProbes > 0) maxProbes
             else model.cfg.numHashTables * model.cfg.numHashFunctions
    val b = model.bucketsPerTable
    val sess = spark
    import sess.implicits._
    val pdf = panel.zipWithIndex.map { case (q, i) =>
      (i.toLong, q.toSeq,
        model.tableCandidates(q, mp).map { case (t, bk) => t * b + bk }.toArray)
    }.toDF("qid", "qe", "cands")
    // A row is stored once per table, and search() dedups candidates
    // by id — so an id's membership at depth p is "ANY copy's
    // (table, bucket) sits within the first p candidates" = the MIN
    // candidate position over its copies. Deduping BEFORE the top-k
    // aggregates is required for correctness, not just economy:
    // duplicate copies of a near neighbor would eat top-k slots and
    // make measured recall non-monotone in probes. (array_position
    // returns 0 when absent; the when() maps that to null, which the
    // BETWEEN filter rejects.)
    val scored = indexDf.crossJoin(broadcast(pdf))
      .select(col("qid"), col("id"),
        (col("table").cast("int") * b + col("bucket").cast("int")).as("pc"),
        array_position(col("cands"),
          col("table").cast("int") * b + col("bucket").cast("int")).as("pos"),
        graft.functions.VectorFunctions.l2sq(col("embedding"),
          col("qe")).as("dd"))
    val perId = scored.groupBy("qid", "id").agg(
      min(col("dd")).as("dd"), // identical across copies
      min(when(col("pos") > 0, col("pos"))).as("minpos"))
    val aggs =
      graft.functions.TopKAgg(col("id"), col("dd"), kk).as("ex") +:
        (1 to mp).map(p => graft.functions.TopKAgg.filtered(spark, "id", "dd",
          kk, s"minpos BETWEEN 1 AND $p").as(s"pr_$p"))
    val perQuery = perId.groupBy("qid").agg(aggs.head, aggs.tail: _*)
      .select((1 to mp).map { p =>
        (size(array_intersect(
          expr("transform(ex, x -> x._1)"),
          expr(s"transform(pr_$p, x -> x._1)"))).cast("double") /
          size(col("ex"))).as(s"r_$p")
      }: _*)
    val row = perQuery.agg(
      avg(col("r_1")), (2 to mp).map(p => avg(col(s"r_$p"))): _*).head
    val curve = (0 until mp).map(row.getDouble)
    val json = s"""{"k":$kk,"panel":${panel.size},""" +
      s""""recall":${curve.map(d => f"$d%.17e").mkString("[", ",", "]")}}"""
    graft.util.FsIo.writeStringAtomic(s"$path/_recall_curve.json", json)
    curve
  }

  /** The persisted measured curve, if [[auditRecallCurve]] has run. */
  def recallCurve(): Option[(Int, Seq[Double])] = {
    val fp = s"$path/_recall_curve.json"
    if (!graft.util.FsIo.exists(fp)) return None
    val s = graft.util.FsIo.readString(fp)
    val k = s.substring(s.indexOf("\"k\":") + 4,
      s.indexWhere(c => c == ',' || c == '}', s.indexOf("\"k\":") + 4)).trim.toInt
    val body = s.substring(s.indexOf("\"recall\":[") + 10, s.lastIndexOf("]"))
    Some((k, body.split(",").map(_.trim.toDouble).toSeq))
  }

  /** Smallest probe count whose MEASURED recall meets the target, or
    * None when no curve is persisted / no measured point reaches it —
    * the caller ([[searchAtRecall]]) then uses [[exact]], because on
    * this layout informed probing cannot promise full coverage.
    */
  def probesForRecall(minRecall: Double): Option[Int] =
    recallCurve().flatMap { case (_, curve) =>
      val i = curve.indexWhere(_ >= minRecall)
      if (i < 0) None else Some(i + 1)
    }

  /** Recall-targeted kNN: probe depth from the persisted measured
    * curve; exact search when the curve is missing, the target is
    * above every measured point, or the requested k differs from the
    * audited k (recall@10 bounds neither recall@50 nor recall@5 at a
    * fixed probe count — r14 ADVICE #1).
    */
  def searchAtRecall(q: Array[Double], k: Int, minRecall: Double): DataFrame = {
    val kk = math.max(1, k)
    RecallCurves.certifiedDepth(recallCurve(), kk, minRecall) match {
      case Some(p) => search(q, kk, p)
      case None => exact(q, kk)
    }
  }

  /** Drop the persisted recall curve on corpus mutation — a stale
    * measured curve would make [[probesForRecall]] silently optimistic.
    */
  private def invalidateRecallCurve(): Unit =
    graft.util.FsIo.delete(s"$path/_recall_curve.json")

  /** Delete ids, rewriting ONLY the (table, bucket) partitions that
    * hold them — each id lives in exactly L partitions, so a delete
    * touches ≤ L·|ids| directories regardless of corpus size (the
    * [[VectorStore.delete]] contract, ×L). Returns rows removed
    * (counted across copies) / L.
    */
  /** Apply a relational table's CHANGE FEED to this index — net
    * per-id actions (see [[FeedSync]]); this layout has no native
    * upsert, so a net insert applies as delete-then-[[add]] (replace
    * semantics, two commits — each snapshot stays consistent, see
    * FeedSync's non-atomicity note). Idempotent under replayed
    * windows. Returns (idsUpserted, idsDeleted).
    */
  def applyChanges(feed: DataFrame, idCol: String = "id",
      embCol: String = "embedding"): (Long, Long) = {
    val (ups, dels) = FeedSync.net(feed, idCol, embCol)
    // replace = delete-then-add; both sides stay distributed (the
    // upsert ids previously transited the driver too)
    val nUp = ups.count()
    if (nUp > 0) { delete(ups.select(col(idCol)), idCol); add(ups, idCol, embCol) }
    // zero-delete windows skip the delete machinery entirely — cheap
    // probe on the checkpointed frame (r13 ADVICE #5)
    val nDel = if (dels.isEmpty) 0L
      else delete(dels, idCol) // distributed: ids never hit the driver
    (nUp, nDel)
  }

  def delete(ids: Seq[Long]): Long = {
    if (ids.isEmpty) return 0L
    import spark.implicits._
    delete(spark.createDataset(ids).toDF("id"), "id")
  }

  /** Distributed delete — ids as a DataFrame column, never through
    * the driver (see [[VectorStore.delete]]); only the affected
    * (table, bucket) PAIRS — bounded by L·numBuckets — are collected.
    * The Seq overload is sugar over this.
    */
  def delete(delDf: DataFrame, idCol: String): Long = {
    val ids = delDf.select(col(idCol).cast("long").as("id")).distinct()
      .localCheckpoint(true) // scanned thrice: semi-join, anti-join ×2
    val (log, cur) = pinned()
    val affected = cur.join(ids, Seq("id"), "left_semi")
      .select(col("table").cast("int"), col("bucket").cast("int"))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    if (affected.isEmpty) return 0L
    val hit = affected.map { case (t, b) =>
      col("table") === t && col("bucket") === b
    }.reduce(_ || _)
    val inParts = cur.where(hit)
    val before = inParts.count()
    val remaining = inParts.join(ids, Seq("id"), "left_anti")
    // replacement files append; one atomic log commit retires the
    // affected partitions' old files (fully-emptied partitions simply
    // publish nothing) — readers see pre- or post-state, never torn
    val created = FileLog.stagedWrite(spark, path, stage =>
      remaining.repartition(affected.size, col("table"), col("bucket"))
        .write.mode("overwrite")
        .partitionBy("table", "bucket").parquet(stage))
    val retired = log.files.filter(f => partOfFile(f).exists(affected))
    // optimistic rewrite: append-only interlopers merge, both land
    // (the delete applies to the snapshot it read); conflicting
    // rewrites fail loudly (see VectorStore.delete)
    FileLog.commitRewrite(spark, path, log, retired.toSet, created,
      log.schemaDdl)
    invalidateRecallCurve()
    (before - remaining.count()) / cfgTables
  }

  private def cfgTables: Long = model.cfg.numHashTables.toLong

  /** Compact each (table, bucket) partition's small files (every add
    * appends ≥1 file per touched partition) — [[VectorStore.compact]]
    * over the two-level layout.
    */
  def compact(targetRowsPerFile: Long = 1 << 20,
              vacuumGraceMs: Long = FileLog.DefaultVacuumGraceMs): (Long, Long) = {
    val (log, df) = pinned()
    val before = log.files.size.toLong
    val maxRow = df.groupBy("table", "bucket").count().agg(max("count")).head
    if (maxRow.isNullAt(0)) return (before, before)
    val filesPerPart = math.max(1L,
      (maxRow.getLong(0) + targetRowsPerFile - 1) / targetRowsPerFile)
    val numParts = math.min(
      model.cfg.numHashTables.toLong * model.bucketsPerTable * filesPerPart,
      Int.MaxValue.toLong)
    val created = FileLog.stagedWrite(spark, path, stage =>
      df.repartition(numParts.toInt, col("table"), col("bucket"),
          pmod(hash(col("id")), lit(filesPerPart)))
        .sortWithinPartitions("table", "bucket", "id")
        .write.mode("overwrite").partitionBy("table", "bucket").parquet(stage))
    // optimistic rewrite: an add() racing this compaction merges —
    // both land with zero row loss; only rewrite/rewrite races fail
    FileLog.commitRewrite(spark, path, log, log.files.toSet, created,
      log.schemaDdl, dataChange = false) // same rows, new files
    FileLog.vacuum(spark, path, retainLast = 1, graceMs = vacuumGraceMs)
    (before, created.size.toLong)
  }
}

object MultiTableStore {

  /** One stored row per (table, input row) with its per-table 2^k
    * bucket code — the ×L scatter, shared by build and add.
    */
  /** Dev-probe hook for [[encode]]. */
  private[graft] def testEncode(df: DataFrame, model: LshModel): DataFrame =
    encode(df, model, "id", "embedding")

  private def encode(df: DataFrame, model: LshModel,
                     idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col(embCol).as("embedding"))
      .select(col("id"), col("embedding"),
        posexplode(model.tableBucketsCol(col("embedding"))))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "bucket")

  private[store] val PartRe = """/table=(\d+)/bucket=(-?\d+)/""".r

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
    val out = encode(df, model, idCol, embCol)
    out.repartition(cfg.numHashTables * model.bucketsPerTable,
        col("table"), col("bucket"))
      .write.mode("overwrite").partitionBy("table", "bucket").parquet(path)
    FileLog.commit(spark, path,
      FileLog.listDataFiles(spark, path), out.schema.toDDL)
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
