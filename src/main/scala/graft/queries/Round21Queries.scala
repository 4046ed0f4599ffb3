package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.{DuckSql, VectorFunctions => VF}
import graft.sources.{GraftLogSource, ManifestScan}
import graft.store.{FileLog, MaintenancePolicy, QuantConfig, QuantIndex, QuantTier}

/** Round-21 queries: the delta-log table layer reached through the
  * PUBLIC SQL/DataFrame reader (`format("graftlog")`) — time travel,
  * batch-watermark reads and planning-time zone skipping without a
  * line of Scala (r14 verdict task #2). The reference has no SQL
  * surface at all; its closest analog is the shard router
  * (`coordinator/coordinator.py:180`) which the manifest's
  * skip-what-can't-match planning generalizes.
  */
object Round21Queries {

  /** v24's recall target — e25's, so the two queries price the same
    * curve point through the two surfaces (native vs REST).
    */
  private val V24Target = 0.7

  @volatile private var v24Oracle: Option[String] = None

  private val Cols = Seq("user_id", "hour_bucket")

  private def cluster(n: Int)(df: org.apache.spark.sql.DataFrame) =
    df.repartitionByRange(n, col("user_id")).sortWithinPartitions("user_id")

  val all: Seq[Q] = Seq(

    // X37 — graftlog reader: build a two-batch manifest table from
    // events (batch 0: user_id < 75 range-clustered into 6 files;
    // batch 1: the rest), then answer THROUGH the public reader:
    //  - versionAsOf pins the batch-0 snapshot (later appends
    //    invisible), with the range predicate zone-pruned at PLANNING
    //    time inside the scan (the `pruned` flag pins that fewer
    //    files than the snapshot's total were planned, and more than
    //    zero — the same contract as x28, now via format("graftlog"));
    //  - batchAsOf resolves the exactly-once watermark to the same
    //    snapshot (rows_b0 = batch-0 rows);
    //  - a plain load reads the current snapshot (rows_cur).
    // The oracle replays all three against the raw events table.
    Q("x37_graftlog_reader",
      (s, d) => {
        val dir = graft.util.TempDirs.create("graft_x37_log").toString
        val ev = Tables.events(s, d).select(col("user_id"),
          expr("ts div 3600000000000").as("hour_bucket"), col("value"))
        ManifestScan.appendBatch(s, dir, ev.where(col("user_id") < 75),
          Cols, 0L, shape = cluster(6))
        val vA = FileLog.read(dir).version
        ManifestScan.appendBatch(s, dir, ev.where(col("user_id") >= 75),
          Cols, 1L, shape = cluster(6))
        val asOf = s.read.format("graftlog")
          .option("versionAsOf", vA.toString).load(dir)
          .where(col("user_id").between(20L, 39L))
        val aggRow = asOf.agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double")
            .as("sum_value")).head
        // at tiny SFs the probe range can be empty: sum() is NULL and
        // a bare getDouble crashes — carry the NULL through (the
        // oracle's sum over the same empty range is NULL too)
        val sumProbe: Any =
          if (aggRow.isNullAt(1)) null
          else math.round(aggRow.getDouble(1) * 1e6) / 1e6
        val (kept, total) = GraftLogSource.lastPlanned.get()
        val rowsB0 = s.read.format("graftlog")
          .option("batchAsOf", "0").load(dir).count()
        val rowsCur = s.read.format("graftlog").load(dir).count()
        asOf.agg(
          count(lit(1)).as("n_events"),
          round(sum(col("value").cast(DecimalType(18, 6))).cast("double"), 6)
            .as("sum_value"))
          .select(col("n_events"), col("sum_value"),
            lit(if (kept > 0 && kept < total) 1 else 0).cast("int")
              .as("pruned"),
            lit(rowsB0).as("rows_b0"),
            lit(rowsCur).as("rows_cur"),
            lit(sumProbe).cast("double").as("sum_probe"))
      },
      Some("""SELECT count(*) AS n_events,
          |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
          |    AS sum_value,
          |  CAST(1 AS INT) AS pruned,
          |  (SELECT count(*) FROM events WHERE user_id < 75) AS rows_b0,
          |  (SELECT count(*) FROM events) AS rows_cur,
          |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
          |    AS sum_probe
          |FROM events
          |WHERE user_id BETWEEN 20 AND 39""".stripMargin)),

    // X38 — bloom point-lookup skipping: write documents clustered by
    // LANG (so doc_id is deliberately UNCLUSTERED — every file's
    // id-zone spans nearly the whole space and range zones prune
    // nothing), attach per-file doc_id blooms to the manifest, then
    // answer `doc_id IN (10, 20, 30)` through format("graftlog"). The
    // `bloom_pruned` flag pins that the bloom planned STRICTLY fewer
    // files than the min/max envelope would have (and more than
    // zero) — the planning-time win range zones cannot deliver for
    // unclustered point probes. The aggregate is oracle-replayed; a
    // bloom false positive only KEEPS a file, so the answer is
    // pruning-invariant by construction.
    Q("x38_bloom_point_skipping",
      (s, d) => {
        val dir = graft.util.TempDirs.create("graft_x38_bloom").toString
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
        ManifestScan.appendBatch(s, dir, docs, Seq("doc_id", "lang"), 0L,
          shape = df => df.repartitionByRange(8, col("lang"), col("doc_id"))
            .sortWithinPartitions("lang", "doc_id"))
        ManifestScan.attachBlooms(s, dir, "doc_id")
        val probe = Seq(10L, 20L, 30L)
        val st = FileLog.read(dir)
        // what the min/max envelope alone would have planned
        val keptRange = st.files.count { f =>
          st.zones.getOrElse(f, Map.empty).get("doc_id")
            .forall(_.overlaps(graft.store.ZoneRange.I64R(10L, 30L)))
        }
        val df = s.read.format("graftlog").load(dir)
          .where(col("doc_id").isin(probe: _*))
        val agg = df.agg(
          count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          countDistinct(col("lang")).as("langs"),
          sum(col("n_chars")).as("chars"))
        agg.head // populate the planning telemetry
        val (keptBloom, total) = GraftLogSource.lastPlanned.get()
        val _ = total
        agg.select(col("n_docs"), col("id_sum"), col("langs"), col("chars"),
          lit(if (keptBloom > 0 && keptBloom < keptRange) 1 else 0)
            .cast("int").as("bloom_pruned"))
      },
      Some("""SELECT count(*) AS n_docs,
          |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
          |  count(DISTINCT lang) AS langs,
          |  CAST(sum(n_chars) AS BIGINT) AS chars,
          |  CAST(1 AS INT) AS bloom_pruned
          |FROM documents
          |WHERE doc_id IN (10, 20, 30)""".stripMargin)),

    // V24 — the recall-targeted OPQ search THROUGH the REST facade
    // (r14 verdict task #7): audit the coarseN curve on the shared
    // quant index, serve it over loopback HTTP, POST /search with
    // {tier, min_recall}, and materialize the JSON response. The
    // response's curve-chosen budget (coarse_n) and results are
    // hash-matched against e25's oracle — the full rotate→encode→
    // ADC→re-rank pipeline replayed in DuckDB at that budget — so the
    // REST surface's knob is verified to reach exactly the engine's
    // curve-driven search, JSON round-trip included.
    Q("v24_http_tier_knn",
      (s, d) => {
        import java.net.URI
        import java.net.http.{HttpClient, HttpRequest, HttpResponse}
        val idx = QuantCache.forDir(s, d)
        val panel = (0L until 10L).map(VectorQueries.qvec(s, d, _))
        idx.auditAdcRecallCurve(panel, k = 10,
          tier = graft.store.QuantTier.Opq)
        val f = new graft.server.HttpFacade(s,
          new graft.server.StoreAdapter.Quant(s, idx), port = 0).start()
        val m = try {
          val q = VectorQueries.qvec(s, d, 0)
          val body = s"""{"query_vector": ${q.mkString("[", ",", "]")},""" +
            s""" "k": 10, "min_recall": $V24Target, "tier": "opq"}"""
          val resp = HttpClient.newHttpClient().send(
            HttpRequest.newBuilder(
              URI.create(s"http://127.0.0.1:${f.boundPort}/search"))
              .POST(HttpRequest.BodyPublishers.ofString(body))
              .header("Content-Type", "application/json").build(),
            HttpResponse.BodyHandlers.ofString())
          require(resp.statusCode() == 200,
            s"facade: HTTP ${resp.statusCode()} ${resp.body()}")
          graft.server.Json.parse(resp.body())
            .asInstanceOf[Map[String, Any]]
        } finally f.stop()
        val n = graft.server.Json.asLong(
          m("coarse_n").asInstanceOf[Vector[Any]].head).toInt
        v24Oracle = Some(
          if (n > 0) QuantCache.opqSqlAt(idx.model, n)
          else QuantCache.exactFallbackSql)
        val ids = m("indices").asInstanceOf[Vector[Vector[Any]]].head
          .map(graft.server.Json.asLong)
        val ds = m("distances").asInstanceOf[Vector[Vector[Any]]].head
          .map(graft.server.Json.asDouble)
        val sess = s
        import sess.implicits._
        ids.zip(ds).toDF("vec_id", "dist")
          .select(col("vec_id"), round(col("dist"), 6).as("dist"),
            lit(n).cast("int").as("coarse_n"))
          .orderBy(col("dist"), col("vec_id"))
      },
      None,
      lateOracle = () => v24Oracle),

    // E26 — policy-driven maintenance (r14 verdict task #5): build a
    // pq-tier index, fragment it with two adds (each appends ≥1 file
    // into every cell it touches), then run ONE maintain() pass with a
    // files-per-cell trigger and a full-probe recall audit. Every
    // decision flag is deterministic by construction — ≥1 cell exceeds
    // one file (compacted), each hot cell collapses to a single file
    // (healed), a fresh build has no persisted curve (curve_stale),
    // probing every cell makes the audit exactly 1.0 ≥ the 0.0 target
    // (retrained = 0, audit_recall = 1.0) — and the exact top-10 over
    // the MAINTAINED index is oracle-replayed against the raw table:
    // compaction must lose no rows and change no answer.
    Q("e26_maintenance",
      (s, d) => {
        val dir = graft.util.TempDirs.create("graft_e26_maint").toString
        val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("embedding"))
        val idx = QuantIndex.build(s, emb.where(col("id") < 450),
          s"$dir/index", QuantConfig(tiers = Set(QuantTier.Pq)))
        idx.add(emb.where(col("id").between(450, 459)))
        idx.add(emb.where(col("id").between(460, 469)))
        val panel = (0L until 3L).map(VectorQueries.qvec(s, d, _))
        val (rep, kept) = idx.maintain(MaintenancePolicy(
          maxFilesPerCell = 1,
          auditPanel = panel, auditK = 10,
          auditNprobe = idx.model.cfg.ivfCells, // full probe: recall ≡ 1
          minRecall = 0.0, vacuumGraceMs = 0L))
        val q = VectorQueries.qvec(s, d, 0)
        kept.indexDf
          .select(col("id").as("vec_id"),
            VF.l2sqLit(col("embedding"), q).as("dd"))
          .orderBy(col("dd"), col("vec_id")).limit(10)
          .select(col("vec_id"), round(col("dd"), 6).as("dist"),
            lit(if (rep.compacted) 1 else 0).cast("int").as("compacted"),
            lit(if (rep.filesAfter < rep.filesBefore) 1 else 0).cast("int")
              .as("healed"),
            lit(if (rep.curveStale) 1 else 0).cast("int").as("curve_stale"),
            lit(if (rep.retrained) 1 else 0).cast("int").as("retrained"),
            lit(rep.measuredRecall.getOrElse(-1.0)).as("audit_recall"))
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
           |SELECT vec_id, round(dd, 6) AS dist,
           |  CAST(1 AS INT) AS compacted, CAST(1 AS INT) AS healed,
           |  CAST(1 AS INT) AS curve_stale, CAST(0 AS INT) AS retrained,
           |  CAST(1.0 AS DOUBLE) AS audit_recall
           |FROM (
           |  SELECT e.vec_id AS vec_id,
           |         ${DuckSql.l2sq("e.embedding", "q.qe")} AS dd
           |  FROM embeddings e, q
           |  WHERE e.vec_id < 470)
           |ORDER BY dd, vec_id LIMIT 10""".stripMargin)))
}
