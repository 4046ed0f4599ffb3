package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{HeavyHittersAgg, TextFunctions => TF}
import graft.sources.ManifestScan

/** Round-15 additions: the frequency member of the sketch family
  * (r83 — mergeable Misra-Gries heavy hitters, next to r7's HLL and
  * r81's KMV) and streaming manifest maintenance (s26 — the x28
  * file-skipping sidecar kept correct by an appending micro-batch
  * sink, with per-batch cost proportional to the appended files).
  */
object Round15Queries {

  val all: Seq[Q] = Seq(

    // R83 — heavy hitters over the token stream via a mergeable
    // Misra-Gries sketch (capacity 1000): ONE partial+final
    // aggregation pass with O(m) state per partition — the
    // distributed top-k-frequent primitive (vocabulary heads, hot-key
    // detection for salting, URL caps) that never groupBys the full
    // key domain. MG estimates are partitioning-dependent but the
    // THEOREM isn't (undercount ≤ n/(m+1) under arbitrary merge
    // trees), so — the r7/r81 convention — the hash-checked output is
    // the EXACT top-10 twin plus a per-row flag certifying the bound:
    // est(wh) ≥ cnt − n/(m+1), with the sketch genuinely supplying
    // est. Zipf tokens (p17 fits the exponent) put the head far above
    // the bound, which is exactly the regime heavy hitters exist for.
    Q("r83_heavy_hitters",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(explode(TF.wordHashes(col("text"))).as("wh"))
        val sk = toks
          .agg(HeavyHittersAgg(col("wh"), 1000).as("sk"),
            count(lit(1)).as("n"))
        val est = sk.select(explode(col("sk")).as(Seq("wh", "est")))
        val bound = sk.select((col("n") / lit(1001L)).cast("long").as("bound"))
        val exact10 = toks.groupBy("wh").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("wh")).limit(10)
        exact10
          .join(est, Seq("wh"), "left").na.fill(0L, Seq("est"))
          .crossJoin(broadcast(bound))
          .select(col("wh"), col("cnt"),
            (col("cnt") - col("est") <= col("bound")).cast("int")
              .as("within_bound"))
          .orderBy(col("cnt").desc, col("wh"))
      },
      Some(s"""WITH toks AS (
           |  SELECT unnest(${TF.wordHashesSql("text")}) AS wh
           |  FROM documents)
           |SELECT wh, count(*) AS cnt, CAST(1 AS INT) AS within_bound
           |FROM toks GROUP BY wh
           |ORDER BY cnt DESC, wh LIMIT 10""".stripMargin)),

    // S26 — streaming ingest that MAINTAINS the x28 manifest: each
    // micro-batch range-clusters its rows and lands them through
    // ManifestScan.appendBatch — a staged write + ONE CAS commit
    // carrying files, footer zones, AND the batch-id watermark, so the
    // sink is EXACTLY-ONCE (a replayed foreachBatch is a no-op, the
    // s13/s21/s22 contract on a relational table) and per-batch
    // overhead follows the batch, not the table. The final read goes
    // through the manifest (pruned flag pins that planning-time
    // skipping works on a STREAMED table); rows are
    // micro-batch-split-invariant (append-only content), so the batch
    // rectangle is the oracle, exactly x28's.
    Q("s26_stream_manifest_ingest",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            expr("ts div 3600000000000").as("hour_bucket"), col("value"))
        val srcDir = graft.util.TempDirs.create("graft_s26_src").toString
        val dataDir = graft.util.TempDirs.create("graft_s26_data").toString
        val ckpt = graft.util.TempDirs.create("graft_s26_ckpt").toString
        ev.repartitionByRange(2, col("user_id"))
          .write.mode("overwrite").parquet(srcDir)
        val schema = s.read.parquet(srcDir).schema
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
          .writeStream
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            ManifestScan.appendBatch(s, dataDir, batch,
              Seq("user_id", "hour_bucket"), batchId = bid,
              shape = _.repartitionByRange(4, col("user_id"))
                .sortWithinPartitions("user_id"))
            ()
          }
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        val (df, kept, total) = ManifestScan.readPruned(s, dataDir,
          Map("user_id" -> (100L, 199L),
            "hour_bucket" -> (473592L, 473712L)))
        df.agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(
              org.apache.spark.sql.types.DecimalType(18, 6))).cast("double")
              .as("sum_value"))
          .select(col("n_events"), round(col("sum_value"), 6).as("sum_value"),
            lit(if (kept > 0 && kept < total) 1 else 0).cast("int")
              .as("pruned"))
      },
      Some("""SELECT count(*) AS n_events,
          |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
          |    AS sum_value,
          |  CAST(1 AS INT) AS pruned
          |FROM events
          |WHERE user_id BETWEEN 100 AND 199
          |  AND epoch_ns(ts) // 3600000000000 BETWEEN 473592 AND 473712"""
          .stripMargin),
      streaming = true),

    // X29 — manifest COMPACTION: pay down the small-files debt an
    // appending sink (s26) accrues. The current 16-file layout rewrites
    // into 4 range-clustered files, the new manifest version references
    // only them, and the rectangle answer is identical — the
    // maintenance pass a log-structured table needs so selective reads
    // keep opening O(selectivity) footers after a million micro-batch
    // appends, with old versions still readable until vacuum.
    Q("x29_manifest_compact",
      (s, d) => {
        val dir = graft.util.TempDirs.create("graft_x29_m").toString
        Round14Queries.x28Write(s, d, dir)
        val (before, after) = ManifestScan.compact(s, dir, "user_id", 4,
          Seq("user_id", "hour_bucket"))
        val (df, kept, total) =
          ManifestScan.readPruned(s, dir, Round14Queries.x28Ranges)
        Round14Queries.x28Agg(df)
          .select(col("n_events"), round(col("sum_value"), 6).as("sum_value"),
            lit(if (after < before) 1 else 0).cast("int").as("compacted"),
            lit(if (kept <= total) 1 else 0).cast("int").as("consistent"))
      },
      Some("""SELECT count(*) AS n_events,
          |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
          |    AS sum_value,
          |  CAST(1 AS INT) AS compacted, CAST(1 AS INT) AS consistent
          |FROM events
          |WHERE user_id BETWEEN 100 AND 199
          |  AND epoch_ns(ts) // 3600000000000 BETWEEN 473592 AND 473712"""
          .stripMargin)),

    // X30 — manifest TIME TRAVEL: every manifest commit snapshots an
    // immutable version, so a pinned version re-reads its exact file
    // set after later appends AND a compaction rewrote the current
    // layout — training-run reproducibility (the file set of epoch N
    // stays re-readable) as a query. v1 = the even-user half; then the
    // odd half appends (v2) and a compaction rewrites everything (v3);
    // the as-of-v1 read must still answer the rectangle over ONLY the
    // even half, while `current` answers over all rows.
    Q("x30_manifest_time_travel",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            expr("ts div 3600000000000").as("hour_bucket"), col("value"))
        val dir = graft.util.TempDirs.create("graft_x30_m").toString
        val cols = Seq("user_id", "hour_bucket")
        ev.where(col("user_id") % 2 === 0)
          .repartitionByRange(4, col("user_id"))
          .sortWithinPartitions("user_id")
          .write.mode("append").parquet(dir)
        ManifestScan.refreshManifest(s, dir, cols) // v1: even half
        ev.where(col("user_id") % 2 === 1)
          .repartitionByRange(4, col("user_id"))
          .sortWithinPartitions("user_id")
          .write.mode("append").parquet(dir)
        ManifestScan.refreshManifest(s, dir, cols) // v2: + odd half
        ManifestScan.compact(s, dir, "user_id", 4, cols) // v3: rewritten
        val v1 = ManifestScan.versions(s, dir).head
        val asOf = Round14Queries.x28Agg(
          ManifestScan.readPrunedAsOf(s, dir, v1, Round14Queries.x28Ranges)._1)
          .select(lit("v1").as("snap"), col("n_events"),
            round(col("sum_value"), 6).as("sum_value"))
        val cur = Round14Queries.x28Agg(
          ManifestScan.readPruned(s, dir, Round14Queries.x28Ranges)._1)
          .select(lit("current").as("snap"), col("n_events"),
            round(col("sum_value"), 6).as("sum_value"))
        cur.unionAll(asOf).orderBy("snap")
      },
      Some("""WITH rect AS (
          |  SELECT user_id, value FROM events
          |  WHERE user_id BETWEEN 100 AND 199
          |    AND epoch_ns(ts) // 3600000000000 BETWEEN 473592 AND 473712)
          |SELECT 'current' AS snap, count(*) AS n_events,
          |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
          |    AS sum_value
          |FROM rect
          |UNION ALL
          |SELECT 'v1' AS snap, count(*) AS n_events,
          |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
          |    AS sum_value
          |FROM rect WHERE user_id % 2 = 0
          |ORDER BY snap""".stripMargin))
  )
}
