package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-5 additions: plan-shape and semantic invariants for the
  * corpus-composition operators (d15/d16/p7) and the Spark 4
  * transformWithState query (s18). Value equality is the driver's
  * DuckDB gate; here we assert the plans scale and the stateful
  * processor survives multi-batch delivery.
  */
class Round5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  def run(name: String) = SparkEntry.queries(name)(spark, sf)
  def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("d15 domain mix is a shuffle-free scan+filter (plus final sort)") {
    val p = plan("d15_domain_mix")
    assert(!p.contains("Exchange hashpartitioning"),
      s"row-local sampling must not hash-shuffle:\n$p")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
  }

  test("d15 sampling is deterministic and within expected rate bounds") {
    val docs = Tables.documents(spark, sf)
    val kept = run("d15_domain_mix")
    val a = kept.collect().map(_.getLong(0)).toSeq
    val b = run("d15_domain_mix").collect().map(_.getLong(0)).toSeq
    assert(a == b, "same inputs must keep the same doc_ids")
    // en is halved: the kept en fraction must be well below 1 and
    // the de fraction exactly 1 (never sampled out).
    val enAll = docs.where(col("lang") === "en").count().toDouble
    val enKept = kept.where(col("lang") === "en").count().toDouble
    assert(enKept / enAll < 0.8, s"en kept $enKept of $enAll")
    val deAll = docs.where(col("lang") === "de").count()
    val deKept = kept.where(col("lang") === "de").count()
    assert(deKept == deAll, "de must be kept whole")
  }

  test("d16 epoch expansion is a generator, not a join, and sums right") {
    val p = plan("d16_upsample_epochs")
    assert(p.contains("Generate"), s"expected generator expansion:\n$p")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val rows = run("d16_upsample_epochs")
    val total = rows.count()
    val expected = Tables.documents(spark, sf)
      .select(sum(when(col("n_chars") >= 400, 3L)
        .when(col("n_chars") >= 200, 2L).otherwise(1L)))
      .head.getLong(0)
    assert(total == expected, s"exploded $total rows, expected $expected")
    // every doc appears exactly n_epochs times, epochs 1..n contiguous
    val bad = rows.groupBy("doc_id", "n_epochs")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"), min("epoch").as("mn"))
      .where(col("n") =!= col("n_epochs") || col("mx") =!= col("n_epochs") ||
        col("mn") =!= 1)
      .count()
    assert(bad == 0, s"$bad docs expanded wrong")
  }

  test("p7 dataset card aggregates once with partial map-side combine") {
    val p = plan("p7_dataset_card")
    assert(p.contains("Expand"), s"rollup should plan an Expand:\n$p")
    // exactly one hash-partitioned exchange (partial -> final agg);
    // the other exchange is the final range sort
    val hashEx = "Exchange hashpartitioning".r
      .findAllMatchIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$p")
    // grand-total row present and exact
    val grand = run("p7_dataset_card")
      .where(col("source").isNull && col("lang").isNull).collect()
    assert(grand.length == 1)
    val nDocs = Tables.documents(spark, sf).count()
    assert(grand.head.getAs[Long]("n_docs") == nDocs)
  }

  test("r73 unpivot is an Expand in the scan stage, not a multi-scan union") {
    val p = plan("r73_unpivot")
    assert(p.contains("Expand"), s"expected Expand:\n$p")
    assert(!p.contains("Union"), s"should not plan a union of scans:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"no wide shuffle belongs here:\n$p")
  }

  test("p8 bigrams come from a generator and join marginals on the word key") {
    val p = plan("p8_pmi_collocations")
    assert(p.contains("Generate"), s"expected generator bigrams:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // d17/d15 hashes must be independent: the salted split of the
    // d15-kept docs still lands ~90/5/5
    val kept = run("d15_domain_mix").select("doc_id")
    val split = run("d17_train_split").join(kept, "doc_id")
    val frac = split.where(col("split") === "train").count().toDouble /
      split.count()
    assert(frac > 0.8 && frac < 0.97, s"train fraction off: $frac")
  }

  test("s18 transformWithState keeps MapState across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      // two source files + maxFilesPerTrigger=1 force TWO micro-batches,
      // so final counts are right only if MapState persists between them
      val srcDir = graft.util.TempDirs.create("graft_s18_spec_src")
      val ckpt = graft.util.TempDirs.create("graft_s18_spec_ckpt").toString
      val ev = spark.read.parquet(s"$sf/events.parquet")
        .select(col("user_id"), col("event_type"))
      ev.where(col("user_id") % 2 === 0).write
        .parquet(srcDir.resolve("part_a").toString)
      ev.write.parquet(srcDir.resolve("part_b").toString)
      val q = spark.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("user_id", "long").add("event_type", "string"))
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString + "/part_*")
        .as[(Long, String)]
        .groupByKey(_._1)
        .transformWithState(new graft.queries.EventTypeCountsProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "event_type", "n")
        .writeStream.format("memory").queryName("s18_spec_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table("s18_spec_sink")
        .groupBy("user_id", "event_type").agg(max("n").as("n"))
      val want = ev.where(col("user_id") % 2 === 0).union(ev)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        "multi-batch counts diverge from the batch union aggregate")
      val batches = spark.table("s18_spec_sink")
        .groupBy("user_id", "event_type").count()
        .where(col("count") > 1).count()
      assert(batches > 0, "expected at least one key emitted in both batches")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
