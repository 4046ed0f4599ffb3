package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Relational scale smoke — the TextScaleSmoke treatment applied to
  * the most expensive r-queries: generate a 10×/20× fact corpus
  * (orders, lineitem, events key-shifted into disjoint copies;
  * dimension tables unchanged — the realistic scale-up shape: more
  * facts against the same dims) and assert, for each query, that
  *
  *  1. it still RUNS and returns rows at both scales, and
  *  2. total shuffle records/bytes written across every exchange in
  *     the executed plan grow ≤2.5× when the fact corpus doubles —
  *     the "no shuffle becomes the bottleneck at 1000×" check; any
  *     accidental fact×fact expansion fails it on the first doubling.
  *
  * Caveat measured honestly: queries that `localCheckpoint` an
  * intermediate (r76/r80) execute those prefix shuffles eagerly,
  * outside the final plan's metrics — for them the assertion covers
  * the iterative tail (which is exactly the part that must not blow
  * up), and the reported wall-clock covers everything.
  */
class RelationalScaleSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Base = "/root/testdata/sf0.01"
  private val K = 10 // copies at scale N (≈600k lineitem), 2K at 2N

  /** The 10 most expensive r-queries by the round-9 bench detail. */
  private val Sweep = Seq(
    "r78_triangle_count", "r79_merge_upsert", "r76_pagerank",
    "r65_tpch_q21", "r77_skew_join", "r54_tpch_q18",
    "r80_bfs_levels", "r43_range_bin_join", "r32_tpch_q5",
    "r82_variant_json")

  /** `copies` disjoint key-shifted replicas of a fact table: the named
    * key columns get `+ k·offset` (offset = max key + 1, so copies
    * never collide); all other columns ride along — the same
    * customers/parts/suppliers receive `copies`× the facts.
    */
  private def replicate(df: DataFrame, keyCols: Seq[String],
                        copies: Int): DataFrame = {
    val off = df.agg(max(col(keyCols.head))).head.getAs[Number](0).longValue() + 1
    val ks = broadcast(spark.range(copies).select(col("id").as("__k")))
    df.crossJoin(ks)
      .select(df.columns.toSeq.map { c =>
        if (keyCols.contains(c))
          (col(c) + col("__k") * off).cast("long").as(c)
        else col(c)
      }: _*)
  }

  /** Write a Tables-compatible sf dir with `copies`× facts. */
  private def sfDir(copies: Int): String = {
    val dir = graft.util.TempDirs.create(s"graft_relscale_$copies").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "documents", "embeddings"))
      Tables.load(spark, Base, t)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    replicate(Tables.orders(spark, Base), Seq("o_orderkey"), copies)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    replicate(Tables.lineitem(spark, Base), Seq("l_orderkey"), copies)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    replicate(Tables.events(spark, Base), Seq("event_id"), copies)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val dir1 = sfDir(K)
  private lazy val dir2 = sfDir(2 * K)

  private def shuffleMetrics(df: DataFrame): (Long, Long) = {
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val shuffles = unwrap(df.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeLike =>
        (s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L),
          s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L))
    }
    (shuffles.map(_._1).sum, shuffles.map(_._2).sum)
  }

  private def withAqeOff[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** One AQE-off execution: (rows, shuffle records, shuffle bytes, s). */
  private def measure(name: String, dir: String): (Long, Long, Long, Double) =
    withAqeOff {
      val df = queries.Registry.all.find(_.name == name)
        .getOrElse(fail(s"unknown query $name")).run(spark, dir)
      val t0 = System.nanoTime()
      val rows = df.collect().length.toLong
      val secs = (System.nanoTime() - t0) / 1e9
      val (rec, by) = shuffleMetrics(df)
      (rows, rec, by, secs)
    }

  test("top-10 r-queries: rows>0 and linear shuffle volume on a fact-corpus doubling") {
    // sanity on the generated corpus itself
    assert(Tables.lineitem(spark, dir1).count() == 60000L * K)
    assert(Tables.orders(spark, dir2).count() == 15000L * 2 * K)
    val failures = scala.collection.mutable.Buffer.empty[String]
    for (q <- Sweep) {
      val (n1, rec1, by1, s1) = measure(q, dir1)
      val (n2, rec2, by2, s2) = measure(q, dir2)
      info(f"$q%-22s N: $n1%,d rows (rec=$rec1%,d, ${by1 / 1e6}%.1f MB, " +
        f"$s1%.1fs)  2N: $n2%,d rows (rec=$rec2%,d, ${by2 / 1e6}%.1f MB, $s2%.1fs)")
      if (n1 <= 0) failures += s"$q returned no rows at N"
      if (n2 <= 0) failures += s"$q returned no rows at 2N"
      // ≤2.5× on a 2× corpus; tiny shuffles (<1k records) are exempt —
      // fixed-size side outputs where one extra batch row breaks ratios
      if (rec1 > 1000 && rec2 > rec1 * 5 / 2)
        failures += f"$q shuffle records grew ${rec2.toDouble / rec1}%.2fx on 2x facts"
      if (by1 > 1000000 && by2 > by1 * 5 / 2)
        failures += f"$q shuffle bytes grew ${by2.toDouble / by1}%.2fx on 2x facts"
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
