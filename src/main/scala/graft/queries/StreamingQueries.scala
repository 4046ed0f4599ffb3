package graft.queries

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Structured Streaming surface (engine generalization — the reference
  * lists streams as future work, `generate_report.py:294-300`): tumbling
  * event-time windows with a watermark over the `events` table, driven
  * here as a file-source micro-batch into a memory sink so the result is
  * a static DataFrame the correctness harness can hash.
  *
  * Append-mode semantics make the emitted set deterministic: a window is
  * emitted iff `window.end <= watermark`, and after one data batch the
  * watermark is `max(event_time) - delay`. The oracle replicates exactly
  * that cutoff in batch SQL.
  */
object StreamingQueries {

  private val sinkId = new AtomicInteger(0)

  /** 1-hour tumbling windows, 10-minute watermark, count per event_type. */
  def tumblingCounts(s: SparkSession, d: String): DataFrame = {
    // Force the nanos-as-long read path before the streaming read.
    Tables.events(s, d)
    val schema = s.read.parquet(s"$d/events.parquet").schema
    val name = s"s1_sink_${sinkId.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s1_ckpt").toString
    // The file stream source wants a directory; stage the (read-only)
    // events file into a temp dir.
    val srcDir = java.nio.file.Files.createTempDirectory("graft_s1_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/events.parquet"),
      srcDir.resolve("events.parquet"))
    val q = s.readStream.schema(schema).parquet(srcDir.toString)
      .select(col("event_type"),
        timestamp_micros(expr("ts div 1000")).as("ets"))
      .withWatermark("ets", "10 minutes")
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
  }

  val all: Seq[Q] = Seq(
    Q("s1_stream_tumble",
      (s, d) => tumblingCounts(s, d),
      // Emitted windows = those fully below the final watermark
      // (max event time − 10 min). Event times are µs-truncated ns, and
      // the engine tracks the watermark at ms precision — irrelevant
      // here because window bounds are hour-aligned.
      Some("""WITH e AS (
          |  SELECT event_type,
          |         epoch_ns(ts) // 1000 AS us,
          |         (epoch_ns(ts) // 1000) // 3600000000 AS hb
          |  FROM events),
          |m AS (SELECT max(us) AS mx FROM e)
          |SELECT event_type, hb AS hour_bucket, count(*) AS n
          |FROM e, m
          |WHERE (hb + 1) * 3600000000 <= mx - 600000000
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
