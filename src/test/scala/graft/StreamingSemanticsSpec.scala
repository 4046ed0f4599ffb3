package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Two-batch golden test for watermark semantics: late rows arriving
  * after their window has been finalized are dropped, and withheld
  * windows never emit if the watermark doesn't advance past them.
  *
  * Batch 1 = the latest 30% of events ("on time"); batch 2 = the
  * earliest 70% ("late" — they arrive after the watermark has moved to
  * max(batch1) − 10 min, far past all of them). Expected emitted set:
  * tumbling counts over batch-1 rows only, windows with
  * end <= watermark. Every late row must be invisible.
  */
class StreamingSemanticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("late data beyond the watermark is dropped") {
    import java.nio.file.{Files, Paths}
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("event_type"), col("ts"))
    val cut = ev.stat.approxQuantile("ts", Array(0.7), 0.0).head.toLong
    val onTime = ev.where(col("ts") >= cut)
    val late = ev.where(col("ts") < cut)

    val dir = Files.createTempDirectory("graft_late").toString
    onTime.coalesce(1).write.parquet(s"$dir/batch")
    late.coalesce(1).write.parquet(s"$dir/batch2")
    // Stage on-time data first; the late file arrives only after the
    // first batch (and its watermark advance) completes — a genuine
    // late arrival rather than a file-ordering assumption.
    val srcDir = Files.createTempDirectory("graft_late_src")
    def stage(from: String, name: String): Unit = {
      val f = new java.io.File(from).listFiles
        .filter(_.getName.endsWith(".parquet")).head.toPath
      Files.copy(f, srcDir.resolve(name))
    }
    stage(s"$dir/batch", "a_ontime.parquet")

    val schema = onTime.schema
    val ckpt = Files.createTempDirectory("graft_late_ckpt").toString
    val q = spark.readStream.schema(schema)
      .parquet(srcDir.toString)
      .select(col("event_type"),
        timestamp_micros(expr("ts div 1000")).as("ets"))
      .withWatermark("ets", "10 minutes")
      .groupBy(col("event_type"), window(col("ets"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        expr("unix_timestamp(window.start) div 3600").as("hb"), col("n"))
      .writeStream.format("memory").queryName("late_test")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable() // batch 1 + watermark advance
    stage(s"$dir/batch2", "b_late.parquet") // late data arrives
    q.processAllAvailable() // batch 2: every row is beyond-watermark
    q.stop()

    val got = spark.table("late_test").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // Expectation: batch-1 rows only, windows closed under the final
    // watermark. No late (batch-2) row may be counted.
    val us = onTime.select(col("event_type"), expr("ts div 1000").as("us"))
    val mx = us.agg(max("us")).head.getLong(0)
    val expected = us
      .withColumn("hb", expr("us div 3600000000"))
      .where((col("hb") + 1) * 3600000000L <= mx - 600000000L)
      .groupBy("event_type", "hb").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(got == expected,
      s"missing=${expected -- got} unexpected=${got -- expected}")
    // sanity: the late half really was older than the final watermark
    val lateMax = late.agg(max("ts")).head.getLong(0) / 1000
    assert(lateMax < mx - 600000000L)
  }
}
