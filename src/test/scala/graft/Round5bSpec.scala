package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import graft.queries.{Round5bQueries, SessionTimerProcessor}

/** Round-5 session-2 additions. The s19 test drives the REAL
  * SessionTimerProcessor across two micro-batches through a file
  * stream, exercising the three paths the single-batch gate cannot
  * separate: (1) a session extended in a later batch must not be
  * double-counted (the stale timer registered in batch 1 is deleted /
  * guarded), (2) an in-batch gap closes a session immediately,
  * (3) the watermark closes an idle session via its event-time timer.
  */
class Round5bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val T0 = 1000000000000000L // µs epoch, well clear of 1970
  private val Min = 60000000L        // one minute in µs

  test("s19 processor across micro-batches: extension, gap close, timer close") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      val srcDir = java.nio.file.Files.createTempDirectory("graft_s19_spec").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_s19_spec_ck").toString

      def stage(name: String, rows: Seq[(Long, Long)]): Unit =
        rows.toDF("user_id", "us").coalesce(1)
          .write.mode("overwrite").parquet(s"$srcDir/$name")

      // batch 1: user 1 opens a session (2 events), user 2 one event
      stage("b1", Seq((1L, T0), (1L, T0 + 10 * Min), (2L, T0)))
      val q = spark.readStream
        .schema("user_id LONG, us LONG")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir)
        .select(col("user_id"), timestamp_micros(col("us")).as("evt"), col("us"))
        .withWatermark("evt", "1 minute")
        .select("user_id", "us").as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new SessionTimerProcessor(Round5bQueries.GapUs),
          TimeMode.EventTime(), OutputMode.Append())
        .toDF("user_id", "n_events", "start_us", "end_us")
        .writeStream.format("memory").queryName("s19_spec")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      // watermark = T0+10min-1min: nothing is closable yet
      assert(spark.table("s19_spec").isEmpty)

      // batch 2: user 1 EXTENDS the open session (20 min after start,
      // within the 30-min gap of its last event), then a far event 3 h
      // later closes it in-batch and opens a new one. User 2 stays
      // idle; the advanced watermark must close their session by timer.
      stage("b2", Seq((1L, T0 + 20 * Min), (1L, T0 + 180 * Min)))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("s19_spec")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set(
        (1L, 3L, T0, T0 + 20 * Min), // extended across batches, gap-closed once
        (2L, 1L, T0, T0)),           // closed by the event-time timer
        s"unexpected emissions: $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("e11 semdedup: drops are near-dups of an earlier kept doc in the same cell") {
    val df = graft.queries.Round5bQueries.all
      .find(_.name == "e11_semdedup").get.run(spark, TestSpark.sf)
    val rows = df.collect()
    assert(rows.length == 16) // one row per coarse cell
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"n != dropped + kept in $r")
    }
    assert(rows.map(_.getLong(1)).sum == 500) // partition of the corpus
  }

  test("d18 blocklist severities are within the declared scale") {
    val df = graft.queries.Round5bQueries.all
      .find(_.name == "d18_blocklist").get.run(spark, TestSpark.sf)
    val sevs = df.select("max_sev").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(sevs.subsetOf(Set(1, 2, 3)))
  }
}
