package graft.queries

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Structured Streaming surface (engine generalization — the reference
  * lists streams as future work, `generate_report.py:294-300`):
  * tumbling, sliding, and session event-time windows with a watermark
  * over the `events` table, driven as file-source micro-batches into a
  * memory sink so the result is a static DataFrame the correctness
  * harness can hash.
  *
  * Append-mode semantics make each emitted set deterministic: a group
  * is emitted once the watermark (max event time − delay, after the
  * final no-data micro-batch) passes its window end. The oracles
  * replicate exactly that cutoff in batch SQL.
  */
object StreamingQueries {

  private val sinkId = new AtomicInteger(0)

  /** Memory-sink names created by earlier streaming runs in this JVM,
    * dropped at the NEXT stream's start. A memory sink holds its full
    * result in the DRIVER until its temp view is released: a 300-query
    * bench/verify sweep (stabilized rows re-run 4×) otherwise
    * accumulates every streaming row's output as permanent GC ballast
    * — the measured ambient inflation on late-sweep rows (e.g. v19:
    * 2.4 s isolated vs 9.2 s in-sweep at r15's baseline). Dropping at
    * the next start is safe for the PREVIOUS query's still-unread
    * frame: `s.table(name)` analyzed eagerly, so that frame binds the
    * sink relation directly — the catalog drop only removes the name.
    */
  private val liveSinks = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Register a fresh memory-sink name, dropping every sink an earlier
    * streaming run left behind (see [[liveSinks]]).
    */
  private[queries] def freshSinkName(s: SparkSession, prefix: String): String = {
    var old = liveSinks.poll()
    while (old != null) {
      try s.catalog.dropTempView(old)
      catch { case _: Throwable => () }
      old = liveSinks.poll()
    }
    val name = s"${prefix}_${sinkId.incrementAndGet()}"
    liveSinks.add(name)
    name
  }

  /** Run `body` with spark.sql.shuffle.partitions temporarily lowered.
    *
    * Every stateful streaming operator maintains one state store PER
    * SHUFFLE PARTITION, each paying snapshot/commit file IO per
    * micro-batch regardless of how little state it holds. The right
    * number tracks state SIZE, not the relational-shuffle default: at
    * bench scale (≤100k events) 32 stores are mostly per-batch commit
    * overhead, while 8 still parallelizes fine. On a real cluster this
    * knob is sized to state volume per executor, just like
    * shuffle.partitions — the point is that streaming state
    * partitioning is a deliberate per-pipeline decision, not an
    * inherited batch default. (The partition count is captured in the
    * checkpoint at stream start, so it applies for the stream's whole
    * life; the final batch read of the memory sink runs outside and is
    * unaffected.)
    */
  /** `ts` from a RAW events scan (the streaming sources read the
    * parquet directly, bypassing [[graft.Tables.events]]'s
    * normalization) as an event-time TIMESTAMP — robust to both
    * testdata layouts: LONG nanoseconds (rounds 1–6, via nanosAsLong)
    * and TIMESTAMP_NTZ microseconds (round 7+). Sessions run in UTC,
    * so the NTZ cast is exact.
    */
  private[queries] def tsAsTimestamp(
      schema: org.apache.spark.sql.types.StructType): Column =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }

  /** Same event time as LONG microseconds since epoch. */
  private[queries] def tsAsMicros(
      schema: org.apache.spark.sql.types.StructType): Column =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }

  private[queries] def withStateShuffle[T](s: SparkSession, n: Int = 8)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }

  /** Run a streaming transform of the events table to completion
    * through a memory sink and return the materialized result.
    * The file stream source wants a directory; the (read-only) events
    * file is staged into a temp dir (`copies` > 1 stages duplicates —
    * used to exercise stateful dedup).
    */
  private def runStream(s: SparkSession, d: String, copies: Int = 1)(
      build: DataFrame => DataFrame): DataFrame = {
    Tables.events(s, d) // force nanosAsLong before the streaming read
    val schema = s.read.parquet(s"$d/events.parquet").schema
    val name = freshSinkName(s, "stream_sink")
    val ckpt = graft.util.TempDirs.create("graft_ckpt").toString
    val srcDir = graft.util.TempDirs.create("graft_src")
    (1 to copies).foreach { i =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        srcDir.resolve(s"events_$i.parquet"))
    }
    val src = s.readStream.schema(schema).parquet(srcDir.toString)
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsAsTimestamp(schema).as("ets"))
    val q = build(src)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    s.table(name)
  }

  val all: Seq[Q] = Seq(

    // S1 — tumbling 1-hour windows, 10-minute watermark, count per type.
    Q("s1_stream_tumble",
      (s, d) => runStream(s, d) { src =>
        src.withWatermark("ets", "10 minutes")
          .groupBy(col("event_type"), window(col("ets"), "1 hour"))
          .agg(count(lit(1)).as("n"))
          .select(col("event_type"),
            expr("unix_timestamp(window.start) div 3600").as("hour_bucket"),
            col("n"))
      }.orderBy("event_type", "hour_bucket"),
      Some("""WITH e AS (
          |  SELECT event_type,
          |         epoch_ns(ts) // 1000 AS us,
          |         (epoch_ns(ts) // 1000) // 3600000000 AS hb
          |  FROM events),
          |m AS (SELECT max(us) AS mx FROM e)
          |SELECT event_type, hb AS hour_bucket, count(*) AS n
          |FROM e, m
          |WHERE (hb + 1) * 3600000000 <= mx - 600000000
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // S2 — sliding windows (2 h size, 30 min slide): each event lands in
    // 4 overlapping windows; emission under the same watermark cutoff.
    Q("s2_stream_sliding",
      (s, d) => runStream(s, d) { src =>
        src.withWatermark("ets", "10 minutes")
          .groupBy(col("event_type"),
            window(col("ets"), "2 hours", "30 minutes"))
          .agg(count(lit(1)).as("n"))
          .select(col("event_type"),
            expr("unix_timestamp(window.start)").as("win_start"),
            col("n"))
      }.orderBy("event_type", "win_start"),
      Some("""WITH e AS (
          |  SELECT event_type, epoch_ns(ts) // 1000 AS us FROM events),
          |m AS (SELECT max(us) AS mx FROM e),
          |w AS (
          |  SELECT event_type,
          |         ((us // 1800000000) - k) * 1800000000 AS ws
          |  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
          |SELECT event_type, ws // 1000000 AS win_start, count(*) AS n
          |FROM w, m
          |WHERE ws + 7200000000 <= mx - 600000000
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // S3 — session windows (30 min gap) per user: stateful session
    // assembly in the engine; sessions emit once the watermark passes
    // last-event + gap. Oracle = island-detection sessionization with
    // the same cutoff.
    Q("s3_stream_session",
      (s, d) => runStream(s, d) { src =>
        src.withWatermark("ets", "10 minutes")
          .groupBy(col("user_id"), session_window(col("ets"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            expr("unix_micros(session_window.start)").as("start_us"),
            expr("unix_micros(session_window.end)").as("end_us"),
            col("n_events"))
      }.orderBy("user_id", "start_us"),
      Some("""WITH flagged AS (
          |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
          |    CASE WHEN lag(epoch_ns(ts) // 1000) OVER w IS NULL
          |           OR epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000) OVER w > 1800000000
          |         THEN 1 ELSE 0 END AS new_s
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
          |sess AS (
          |  SELECT user_id, us,
          |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          |  FROM flagged),
          |agg AS (
          |  SELECT user_id, sid, min(us) AS start_us,
          |         max(us) + 1800000000 AS end_us, count(*) AS n_events
          |  FROM sess GROUP BY 1, 2),
          |m AS (SELECT max(epoch_ns(ts) // 1000) AS mx FROM events)
          |SELECT user_id, start_us, end_us, n_events
          |FROM agg, m WHERE end_us <= mx - 600000000
          |ORDER BY user_id, start_us""".stripMargin)),

    // S4 — stateful streaming deduplication: the source is staged with
    // the events file TWICE; dropDuplicates keyed on event_id (with a
    // watermark bounding the dedup state) must make the duplicate pass
    // invisible. Dedup rows emit immediately in append mode, so the
    // post-hoc aggregation sees exactly the distinct set — the oracle
    // is the plain batch aggregation over the single copy.
    Q("s4_stream_dedup",
      (s, d) => runStream(s, d, copies = 2) { src =>
        src.withWatermark("ets", "10 minutes")
          .dropDuplicates("event_id")
      }.groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // S5 — stream–static join: the event stream enriched against a
    // static dimension (broadcast on the stream side), counted per
    // segment. Inner stream-static joins emit rows immediately, so
    // results equal the batch join.
    Q("s5_stream_static_join",
      (s, d) => {
        val users = Tables.customer(s, d)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        runStream(s, d) { src =>
          src.join(broadcast(users), Seq("user_id"), "inner")
        }.groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n
          |FROM events JOIN customer ON user_id = c_custkey
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // S6 — stream–stream interval join: for each event, the later
    // events of the same user within 1 hour. Both sides watermarked;
    // the time-range bound lets the engine evict join state. Raw pairs
    // land in the sink (inner joins emit on match), aggregated post
    // hoc; the oracle is the batch interval join.
    Q("s6_stream_stream_join",
      (s, d) => {
        Tables.events(s, d)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = freshSinkName(s, "s6_sink")
        val ckpt = graft.util.TempDirs.create("graft_s6_ckpt").toString
        val srcDir = graft.util.TempDirs.create("graft_s6_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          srcDir.resolve("events.parquet"))
        def side(prefix: String) = s.readStream.schema(schema)
          .parquet(srcDir.toString)
          .select(col("event_id").as(s"${prefix}_id"),
            col("user_id").as(s"${prefix}_user"),
            tsAsTimestamp(schema).as(s"${prefix}_ets"))
          .withWatermark(s"${prefix}_ets", "10 minutes")
        val joined = side("a").join(side("b"),
          expr("""a_user = b_user AND a_id <> b_id AND
                 |b_ets >= a_ets AND b_ets <= a_ets + INTERVAL 1 HOUR""".stripMargin),
          "inner")
        val q = joined.select(col("a_id"), col("b_id"))
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        s.table(name).groupBy("a_id").agg(count(lit(1)).as("n_later"))
          .orderBy("a_id")
      },
      Some("""SELECT a.event_id AS a_id, count(*) AS n_later
          |FROM events a JOIN events b
          |  ON a.user_id = b.user_id AND a.event_id <> b.event_id
          |  AND epoch_ns(b.ts) // 1000 >= epoch_ns(a.ts) // 1000
          |  AND epoch_ns(b.ts) // 1000 <= epoch_ns(a.ts) // 1000 + 3600000000
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // S7 — foreachBatch sink: per-micro-batch partial aggregates
    // appended to a parquet table, re-aggregated after the run. The
    // partial/final split is batch-boundary-invariant (DECIMAL sums
    // merge exactly), so the result equals the batch aggregation no
    // matter how the source splits into micro-batches — the idempotent
    // upsert-into-table pattern of a production streaming pipeline.
    Q("s7_stream_foreach_batch",
      (s, d) => {
        Tables.events(s, d)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val ckpt = graft.util.TempDirs.create("graft_s7_ckpt").toString
        val srcDir = graft.util.TempDirs.create("graft_s7_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          srcDir.resolve("events.parquet"))
        val outDir = graft.util.TempDirs.create("graft_s7_out").toString + "/agg"
        val src = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.toString)
          .select(col("event_type"),
            col("value").cast(DecimalType(18, 6)).as("dv"))
        val q = src.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            batch.groupBy("event_type")
              .agg(count(lit(1)).as("pn"), sum("dv").as("pv"))
              .write.mode("append").parquet(outDir)
          }
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        s.read.parquet(outDir)
          .groupBy("event_type")
          .agg(sum("pn").cast("long").as("n"),
            sum("pv").cast("double").as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // S8 — custom stateful operator via KeyValueGroupedDataset
    // .mapGroupsWithState: a per-user running profile (count, first/last
    // event time, exact BigDecimal value sum — order-independent, so
    // the iterator's shuffle order is irrelevant). One source file →
    // one micro-batch → one update emission per key; the oracle is the
    // per-user batch profile. This is the escape hatch for state
    // machines session_window/dropDuplicates can't express.
    Q("s8_stream_custom_state",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.streaming.GroupStateTimeout
        Tables.events(s, d)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = freshSinkName(s, "s8_sink")
        val ckpt = graft.util.TempDirs.create("graft_s8_ckpt").toString
        val srcDir = graft.util.TempDirs.create("graft_s8_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          srcDir.resolve("events.parquet"))
        val src = s.readStream.schema(schema).parquet(srcDir.toString)
          .select(col("user_id"), tsAsMicros(schema).as("us"),
            col("value").cast(DecimalType(18, 6)).as("dv"))
          .as[(Long, Long, java.math.BigDecimal)]
        val q = src.groupByKey(_._1)
          .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
            (user: Long, rows: Iterator[(Long, Long, java.math.BigDecimal)],
             state: org.apache.spark.sql.streaming.GroupState[
               (Long, Long, Long, java.math.BigDecimal)]) =>
              val zero = (0L, Long.MaxValue, Long.MinValue,
                java.math.BigDecimal.ZERO)
              val merged = rows.foldLeft(state.getOption.getOrElse(zero)) {
                case ((n, lo, hi, sum), (_, us, dv)) =>
                  (n + 1, math.min(lo, us), math.max(hi, us), sum.add(dv))
              }
              state.update(merged)
              (user, merged._1, merged._2, merged._3,
                merged._4.doubleValue)
          }
          .toDF("user_id", "n_events", "first_us", "last_us", "sum_value")
          .writeStream.format("memory").queryName(name)
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        // one emission per (key, batch); keep the final state per key
        s.table(name).groupBy("user_id")
          .agg(max("n_events").as("n_events"), min("first_us").as("first_us"),
            max("last_us").as("last_us"),
            expr("max_by(sum_value, n_events)").as("sum_value"))
          .select(col("user_id"), col("n_events"), col("first_us"),
            col("last_us"), round(col("sum_value"), 6).as("sum_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
          |  min(epoch_ns(ts) // 1000) AS first_us,
          |  max(epoch_ns(ts) // 1000) AS last_us,
          |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
          |    AS sum_value
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // S9 — complete output mode: every trigger re-emits the FULL
    // aggregate table (no watermark cutoff), so the final memory-sink
    // snapshot equals the batch aggregation over everything — the
    // dashboard-materialization mode, complementing append (s1–s3) and
    // update (s8).
    Q("s9_stream_complete",
      (s, d) => {
        Tables.events(s, d)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = freshSinkName(s, "s9_sink")
        val ckpt = graft.util.TempDirs.create("graft_s9_ckpt").toString
        val srcDir = graft.util.TempDirs.create("graft_s9_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          srcDir.resolve("events.parquet"))
        val src = s.readStream.schema(schema).parquet(srcDir.toString)
          .select(col("event_type"),
            tsAsTimestamp(schema).as("ets"))
        val q = src
          .groupBy(col("event_type"), window(col("ets"), "1 hour"))
          .agg(count(lit(1)).as("n"))
          .select(col("event_type"),
            expr("unix_timestamp(window.start) div 3600").as("hour_bucket"),
            col("n"))
          .writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        s.table(name).orderBy("event_type", "hour_bucket")
      },
      Some("""SELECT event_type,
          |  (epoch_ns(ts) // 1000) // 3600000000 AS hour_bucket,
          |  count(*) AS n
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // S10 — incremental (multi-micro-batch) processing equals the
    // single-batch result: the source is staged as TWO time-split
    // parquet halves (cut on an hour boundary, so no window straddles
    // the cut and nothing arrives behind the watermark) consumed one
    // file per trigger in time order; the watermark only grows, every
    // window is emitted exactly once when the watermark passes it, so
    // the appended union across batches equals s1's single-batch set —
    // and the same batch-SQL oracle proves it.
    Q("s10_stream_incremental",
      (s, d) => {
        Tables.events(s, d)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = freshSinkName(s, "s10_sink")
        val ckpt = graft.util.TempDirs.create("graft_s10_ckpt").toString
        val srcDir = graft.util.TempDirs.create("graft_s10_src")
        val full = s.read.parquet(s"$d/events.parquet")
          .withColumn("us", tsAsMicros(schema))
        val Array(lo, hi) = full.agg(min("us"), max("us")).head
          .toSeq.map(_.asInstanceOf[Long]).toArray
        val cutUs = ((lo + hi) / 2 / 3600000000L) * 3600000000L
        def stage(cond: org.apache.spark.sql.Column, sub: String,
                  mtime: Long): Unit = {
          val dir = srcDir.resolve(sub)
          full.where(cond).drop("us").coalesce(1).write.parquet(dir.toString)
          java.nio.file.Files.list(dir).forEach(p =>
            java.nio.file.Files.setLastModifiedTime(p,
              java.nio.file.attribute.FileTime.fromMillis(mtime)))
        }
        val now = 1700000000000L // fixed, ordered staging times
        stage(col("us") < cutUs, "a_first", now)
        stage(col("us") >= cutUs, "b_second", now + 60000)
        val src = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true")
          .parquet(srcDir.toString)
          .select(col("event_type"),
            tsAsTimestamp(schema).as("ets"))
        val q = src.withWatermark("ets", "10 minutes")
          .groupBy(col("event_type"), window(col("ets"), "1 hour"))
          .agg(count(lit(1)).as("n"))
          .select(col("event_type"),
            expr("unix_timestamp(window.start) div 3600").as("hour_bucket"),
            col("n"))
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        s.table(name).orderBy("event_type", "hour_bucket")
      },
      Some("""WITH e AS (
          |  SELECT event_type,
          |         epoch_ns(ts) // 1000 AS us,
          |         (epoch_ns(ts) // 1000) // 3600000000 AS hb
          |  FROM events),
          |m AS (SELECT max(us) AS mx FROM e)
          |SELECT event_type, hb AS hour_bucket, count(*) AS n
          |FROM e, m
          |WHERE (hb + 1) * 3600000000 <= mx - 600000000
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // S11 — stream–stream LEFT OUTER interval join: matched pairs emit
    // on match (like s6); an unmatched left emits one null row once the
    // watermark proves no future partner can arrive (its join window
    // upper bound falls below the final watermark). Lefts whose window
    // is still open when the stream ends stay in state and never emit —
    // the oracle encodes exactly that cutoff.
    Q("s11_stream_outer_join",
      (s, d) => {
        Tables.events(s, d)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = freshSinkName(s, "s11_sink")
        val ckpt = graft.util.TempDirs.create("graft_s11_ckpt").toString
        val srcDir = graft.util.TempDirs.create("graft_s11_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          srcDir.resolve("events.parquet"))
        def side(prefix: String, pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          s.readStream.schema(schema).parquet(srcDir.toString)
            .where(pred(col("event_type")))
            .select(col("event_id").as(s"${prefix}_id"),
              col("user_id").as(s"${prefix}_user"),
              tsAsTimestamp(schema).as(s"${prefix}_ets"))
            .withWatermark(s"${prefix}_ets", "10 minutes")
        val clicks = side("a", _ === "click")
        val purchases = side("b", _ === "purchase")
        val joined = clicks.join(purchases,
          expr("""a_user = b_user AND
                 |b_ets >= a_ets AND b_ets <= a_ets + INTERVAL 30 MINUTES""".stripMargin),
          "leftOuter")
        val q = joined.select(col("a_id"), col("b_id"))
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        s.table(name).groupBy("a_id")
          .agg(count(col("b_id")).as("n_purch"))
          .orderBy("a_id")
      },
      Some("""WITH a AS (SELECT event_id AS a_id, user_id,
          |        epoch_ns(ts) // 1000 AS us
          |      FROM events WHERE event_type = 'click'),
          |b AS (SELECT user_id, epoch_ns(ts) // 1000 AS us
          |      FROM events WHERE event_type = 'purchase'),
          |m AS (
          |  -- Spark's global watermark = min over both sides' (max
          |  -- event time - delay), truncated to milliseconds
          |  SELECT (least((SELECT max(us) FROM a), (SELECT max(us) FROM b))
          |          - 600000000) // 1000 * 1000 AS wm),
          |j AS (SELECT a.a_id, a.us AS aus, b.us AS bus
          |      FROM a LEFT JOIN b
          |        ON a.user_id = b.user_id
          |        AND b.us >= a.us AND b.us <= a.us + 1800000000)
          |SELECT a_id, count(bus) AS n_purch
          |FROM j, m
          |WHERE bus IS NOT NULL
          |   OR aus + 1800000000 < wm
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // S12 — RocksDB state store: the s1 tumbling-window aggregation
    // executed with spark.sql.streaming.stateStore.providerClass =
    // RocksDBStateStoreProvider. At 100 TB-scale streaming, state no
    // longer fits the executor heap; RocksDB spills it to local SSD
    // with incremental checkpointing — the production state backend.
    // Same oracle as the in-memory provider: the backend must not
    // change query semantics.
    Q("s12_rocksdb_state",
      (s, d) => {
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
          "state.RocksDBStateStoreProvider")
        try {
          Tables.events(s, d)
          val schema = s.read.parquet(s"$d/events.parquet").schema
          val name = freshSinkName(s, "s12_sink")
          val ckpt = graft.util.TempDirs.create("graft_s12_ckpt").toString
          val srcDir = graft.util.TempDirs.create("graft_s12_src")
          java.nio.file.Files.copy(
            java.nio.file.Paths.get(s"$d/events.parquet"),
            srcDir.resolve("events.parquet"))
          val src = s.readStream.schema(schema).parquet(srcDir.toString)
            .select(col("event_type"),
              tsAsTimestamp(schema).as("ets"))
          val q = src.withWatermark("ets", "10 minutes")
            .groupBy(window(col("ets"), "1 hour"), col("event_type"))
            .count()
            .select(col("window.start").cast("long").as("win_start_s"),
              col("event_type"), col("count").as("n"))
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
          q.processAllAvailable()
          q.stop()
          s.table(name).orderBy("win_start_s", "event_type")
        } finally {
          prev match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
        }
      },
      // Append mode emits only windows closed by the final watermark:
      // win_end <= max(ets) - 10 min — the same cutoff rule as s1.
      Some("""WITH e AS (
          |  SELECT event_type, epoch_ns(ts) // 1000 AS us FROM events),
          |m AS (SELECT max(us) AS mx FROM e),
          |w AS (
          |  SELECT (us // 3600000000) * 3600 AS win_start_s, event_type,
          |    count(*) AS n
          |  FROM e, m
          |  WHERE ((us // 3600000000) + 1) * 3600000000 <= mx - 600000000
          |  GROUP BY 1, 2)
          |SELECT win_start_s, event_type, n FROM w
          |ORDER BY 1, 2""".stripMargin)),

    // S13 — streaming INDEX INGEST: the reference's batched HTTP ingest
    // loop (`load_coco_embeddings.py:38-115`: 1000-vector POSTs with a
    // sleep between batches) re-expressed as a Structured Streaming
    // pipeline — embeddings staged as 4 parquet files, file-source
    // micro-batches (maxFilesPerTrigger=1), each batch bucketized and
    // appended to the partitioned store via foreachBatch (the
    // idempotent ingest sink shape). Ingest must be semantically
    // invisible: once drained, exact search over the streamed-in index
    // equals v1 over the raw table, which is the oracle.
    Q("s13_stream_index_ingest",
      (s, d) => {
        val emb = s.read.parquet(s"$d/embeddings.parquet")
        val srcDir = graft.util.TempDirs.create("graft_s13_src").toString
        emb.repartition(4).write.mode("overwrite").parquet(s"$srcDir/files")
        val ckpt = graft.util.TempDirs.create("graft_s13_ckpt").toString
        val path = graft.util.TempDirs.create("graft_s13_idx").toString + "/index"
        val model = graft.lsh.LshModel(
          graft.lsh.LshConfig(dim = 64, seed = 42L))
        val store = new graft.store.VectorStore(s, path, model)
        val q = s.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$srcDir/files")
          .select(col("vec_id").as("id"), col("embedding"))
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], bid: Long) =>
            // exactly-once: replayed micro-batches no-op on the batch id
            store.add(batch, batchId = Some(bid))
          }
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        model.save(s"$path/_lsh_model.json")
        store.search(VectorQueries.qvec(s, d, 0), 10,
            probes = model.numBuckets)
          .select(col("id").as("vec_id"), round(col("dist"), 6).as("dist"))
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
          |SELECT vec_id, round(d, 6) AS dist FROM (
          |  SELECT e.vec_id AS vec_id, ${graft.functions.DuckSql.l2sq("e.embedding", "q.qe")} AS d
          |  FROM embeddings e, q)
          |ORDER BY d, vec_id LIMIT 10""".stripMargin)),

    // S14 — streaming sequence packing: the stateful twin of
    // d11_pack_shards. flatMapGroupsWithState keyed by source carries
    // the running token count across micro-batches, so shard ids keep
    // advancing as new docs stream in (the state is ONE long per
    // source — constant-size, RocksDB-friendly). A single staged file
    // makes arrival order deterministic (one batch; rows sorted by
    // doc_id inside the group function), which is what lets the batch
    // window compute the exact same assignment as the oracle.
    Q("s14_stream_pack",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
        val schema = s.read.parquet(s"$d/documents.parquet").schema
        val name = freshSinkName(s, "s14_sink")
        val ckpt = graft.util.TempDirs.create("graft_s14_ckpt").toString
        val srcDir = graft.util.TempDirs.create("graft_s14_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/documents.parquet"),
          srcDir.resolve("documents.parquet"))
        val src = s.readStream.schema(schema).parquet(srcDir.toString)
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .as[(String, Long, Long)]
        val q = src.groupByKey(_._1)
          .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (srcKey: String, rows: Iterator[(String, Long, Long)],
             state: org.apache.spark.sql.streaming.GroupState[Long]) =>
              var cum = state.getOption.getOrElse(0L)
              val out = rows.toSeq.sortBy(_._2).map { case (_, id, tok) =>
                val shard = cum / 512
                cum += tok
                (srcKey, id, tok, shard)
              }
              state.update(cum)
              out.iterator
          }
          .toDF("source", "doc_id", "n_tok", "shard_id")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        s.table(name).orderBy("source", "doc_id")
      },
      Some("""WITH t AS (
          |  SELECT doc_id, source,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          |  FROM documents)
          |SELECT source, doc_id, n_tok,
          |  CAST((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
          |    // 512 AS BIGINT) AS shard_id
          |FROM t ORDER BY source, doc_id""".stripMargin)),

    // S15 — streaming quality routing: foreachBatch fans each
    // micro-batch out to TWO sinks (accept/reject by token-count
    // gate) — the multi-sink split every streaming curation pipeline
    // needs and single-sink writeStream can't express. Each batch
    // writes both partitions once (no per-row driver logic); the
    // result re-reads both sinks and the oracle recomputes the gate
    // as a CASE over the batch table.
    Q("s15_stream_quality_route",
      (s, d) => {
        val schema = s.read.parquet(s"$d/documents.parquet").schema
        val ckpt = graft.util.TempDirs.create("graft_s15_ckpt").toString
        val srcDir = graft.util.TempDirs.create("graft_s15_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/documents.parquet"),
          srcDir.resolve("documents.parquet"))
        val outRoot = graft.util.TempDirs.create("graft_s15_out").toString
        val accept = s"$outRoot/accept"; val reject = s"$outRoot/reject"
        // Pre-create BOTH sinks with an empty zero-row batch: if every
        // doc routes to one side, the other directory would otherwise
        // never exist and the post-stream read would throw — the result
        // must not depend on the fixture containing both classes.
        val emptyBatch = s.read.parquet(s"$d/documents.parquet")
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .limit(0)
        emptyBatch.write.mode("append").parquet(accept)
        emptyBatch.write.mode("append").parquet(reject)
        val src = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.toString)
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
        val q = src.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            val scored = batch.persist()
            scored.where(col("n_tok") >= 20)
              .write.mode("append").parquet(accept)
            scored.where(col("n_tok") < 20)
              .write.mode("append").parquet(reject)
            scored.unpersist()
            ()
          }
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        val a = s.read.parquet(accept).withColumn("sink", lit("accept"))
        val r = s.read.parquet(reject).withColumn("sink", lit("reject"))
        a.unionByName(r)
          .groupBy("sink")
          .agg(count(lit(1)).as("n"), sum("n_tok").as("tokens"))
          .orderBy("sink")
      },
      Some("""SELECT sink, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(n_tok) AS BIGINT) AS tokens
          |FROM (
          |  SELECT CASE WHEN len(string_split(text, ' ')) >= 20
          |           THEN 'accept' ELSE 'reject' END AS sink,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          |  FROM documents)
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // S16 — streaming dedup with WATERMARKED state eviction:
    // dropDuplicatesWithinWatermark is the production form of s4's
    // dropDuplicates — state for a key is dropped once the watermark
    // passes it, so memory is bounded by the lateness window instead
    // of the whole history. Only the KEY columns are emitted (which
    // row of a duplicate group survives is arrival-order-dependent;
    // the key set is not), so the oracle is the batch DISTINCT.
    Q("s16_stream_dedup_watermark",
      (s, d) => {
        Tables.events(s, d)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = freshSinkName(s, "s16_sink")
        val ckpt = graft.util.TempDirs.create("graft_s16_ckpt").toString
        val srcDir = graft.util.TempDirs.create("graft_s16_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          srcDir.resolve("events.parquet"))
        val q = s.readStream.schema(schema).parquet(srcDir.toString)
          .select(col("user_id"), col("event_type"),
            tsAsTimestamp(schema).as("evt"))
          .withWatermark("evt", "1 hour")
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .select("user_id", "event_type")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        s.table(name).orderBy("user_id", "event_type")
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events
          |ORDER BY user_id, event_type""".stripMargin)),

    // S17 — Trigger.AvailableNow: process everything available, then
    // STOP — the scheduled-incremental pattern (a cron'd job drains
    // the backlog with streaming-checkpoint exactly-once semantics,
    // no always-on cluster). Query shape mirrors s1's tumbling count;
    // the trigger is what's under test: awaitTermination returns on
    // its own, no processAllAvailable/stop pair.
    Q("s17_stream_available_now",
      (s, d) => {
        Tables.events(s, d)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = freshSinkName(s, "s17_sink")
        val ckpt = graft.util.TempDirs.create("graft_s17_ckpt").toString
        val srcDir = graft.util.TempDirs.create("graft_s17_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          srcDir.resolve("events.parquet"))
        val q = s.readStream.schema(schema).parquet(srcDir.toString)
          .select(col("event_type"), tsAsMicros(schema).as("us"))
          .select(col("event_type"), expr("us div 3600000000").as("hour"))
          .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .start()
        q.awaitTermination()
        s.table(name).orderBy("event_type", "hour")
      },
      Some("""SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
          |  CAST(count(*) AS BIGINT) AS n
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // S18 — the Spark 4 transformWithState API (the successor to
    // mapGroupsWithState used by s8): a StatefulProcessor holding a
    // typed MapState[event_type -> count] per user, emitting updated
    // counts each micro-batch. MapState is the right state shape here
    // because updates touch ONE sub-key per row — under RocksDB each
    // (user, event_type) entry is its own store key, so a hot user
    // with many event types doesn't rewrite a monolithic blob per
    // update the way a ValueState[Map] (or s8's tuple state) would.
    // transformWithState requires the RocksDB provider; set/restore
    // like s12. Final per-key counts = the batch group-by.
    Q("s18_transform_with_state",
      (s, d) => {
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
          "state.RocksDBStateStoreProvider")
        try {
          import s.implicits._
          import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
          Tables.events(s, d)
          val schema = s.read.parquet(s"$d/events.parquet").schema
          val name = freshSinkName(s, "s18_sink")
          val ckpt = graft.util.TempDirs.create("graft_s18_ckpt").toString
          val srcDir = graft.util.TempDirs.create("graft_s18_src")
          java.nio.file.Files.copy(
            java.nio.file.Paths.get(s"$d/events.parquet"),
            srcDir.resolve("events.parquet"))
          val q = s.readStream.schema(schema).parquet(srcDir.toString)
            .select(col("user_id"), col("event_type"))
            .as[(Long, String)]
            .groupByKey(_._1)
            .transformWithState(new EventTypeCountsProcessor,
              TimeMode.None(), OutputMode.Update())
            .toDF("user_id", "event_type", "n")
            .writeStream.format("memory").queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
          q.processAllAvailable()
          q.stop()
          // one emission per (key, batch); the final count per
          // (user, event_type) is the largest emitted
          s.table(name).groupBy("user_id", "event_type")
            .agg(max("n").as("n"))
            .orderBy("user_id", "event_type")
        } finally {
          prev match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
        }
      },
      Some("""SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  ).map { q =>
    // Every streaming run (source staging, stream start,
    // processAllAvailable) executes under the lowered state-store
    // partitioning; the returned batch frame over the memory sink is
    // materialized later, outside the override.
    q.copy(run = (s, d) => withStateShuffle(s)(q.run(s, d)),
      streaming = true)
  }
}

/** s18's StatefulProcessor: per-user running counts by event type in
  * a typed MapState. Emits (user, event_type, updated_count) for each
  * sub-key touched in the micro-batch — update-mode granularity, so
  * downstream sees only changed counts, never a full re-emission.
  * Visible to tests so Round5Spec drives THIS class (not a clone)
  * across multiple micro-batches.
  */
private[graft] class EventTypeCountsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String), (Long, String, Long)] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{MapState, OutputMode, TTLConfig, TimeMode}

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, String)],
      timers: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, String, Long)] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { case (_, et) =>
      val n = if (counts.containsKey(et)) counts.getValue(et) else 0L
      counts.updateValue(et, n + 1)
      touched += et
    }
    touched.iterator.map(et => (key, et, counts.getValue(et)))
  }
}
