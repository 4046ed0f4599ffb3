package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Smoke + semantic checks over the declared inventory at sf0.001.
  * (Cross-engine value equality is enforced by the driver's DuckDB
  * oracle at sf0.01; `dev/compare.py` replicates that gate locally.)
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
    }
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("v1 top-1 is the query vector itself at distance 0") {
    val r = run("v1_knn").head
    assert(r.getLong(0) == 0L && r.getDouble(1) == 0.0)
  }

  test("v2 k-clamp returns the whole table") {
    assert(run("v2_knn_clamp").count() == 500)
  }

  test("v3 empty relation yields empty result") {
    assert(run("v3_knn_empty").count() == 0)
  }

  test("v8 pruned kNN is a subset of exact kNN over the full table") {
    val pruned = run("v8_pruned_knn").collect().map(_.getLong(0)).toSet
    val exactAll = run("v2_knn_clamp").collect().map(_.getLong(0)).toSet
    assert(pruned.subsetOf(exactAll))
  }

  test("r7 approx distinct within 5% of exact (gated flag)") {
    val exact = run("r7_count_distinct").head.getLong(0)
    val r = run("r7_approx_distinct").head
    assert(r.getLong(0) == exact, "exact twin disagrees with r7_count_distinct")
    assert(r.getInt(1) == 1, "HLL++ estimate outside 5% of exact")
  }

  test("v5 histogram counts sum to table size") {
    assert(run("v5_lsh_hist").agg(sum("cnt")).head.getLong(0) == 500)
  }

  test("v6 returns 5 ranked neighbors per query, no self-matches") {
    val rows = run("v6_batch_knn").collect()
    assert(rows.length == 25)
    assert(rows.forall(r => r.getLong(2) != r.getLong(0)))
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach(g => assert(g.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
  }

  test("streaming tumble equals batch aggregation below the watermark") {
    val streamed = run("s1_stream_tumble").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 1000").as("us"))
    val mx = ev.agg(max("us")).head.getLong(0)
    val batch = ev
      .withColumn("hb", expr("us div 3600000000"))
      .where((col("hb") + 1) * 3600000000L <= mx - 600000000L)
      .groupBy("event_type", "hb").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("x1 multimodal metadata derives from payload bytes") {
    val r = run("x1_multimodal_meta").head
    val n = r.getLong(1)
    assert(r.getLong(2) == 16 + (n * 7919) % 1920)
    assert(r.getLong(3) == 16 + (n * 104729) % 1080)
    assert(r.getLong(4) == 1 + n % 30)
  }
}
