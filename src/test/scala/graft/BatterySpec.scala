package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class BatterySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("r29 top token equals direct frequency count") {
    val top = run("r29_token_explode").head
    val direct = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
      .groupBy("t").count()
      .orderBy(col("count").desc, col("t")).head
    assert(top.getString(0) == direct.getString(0))
    assert(top.getLong(1) == direct.getLong(1))
  }

  test("r31 q3: at most 10 rows, revenue descending, positive") {
    val rows = run("r31_tpch_q3").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(2))
    assert(revs.sameElements(revs.sorted.reverse))
    assert(revs.forall(_ > 0))
  }

  test("r32 q5: nation dim joins broadcast") {
    val plan = run("r32_tpch_q5").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("r27 argmax aggregates are keyed on the unique orderkey") {
    val byPrio = run("r27_cond_agg").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    val direct = Tables.orders(spark, sf)
      .orderBy(col("o_orderkey").desc).select("o_orderpriority", "o_orderstatus")
      .collect().groupBy(_.getString(0))
    direct.foreach { case (prio, rows) =>
      assert(byPrio(prio)._1 == rows.head.getString(1),   // max orderkey
        s"max_by mismatch for $prio")
      assert(byPrio(prio)._2 == rows.last.getString(1),   // min orderkey
        s"min_by mismatch for $prio")
    }
  }

  test("x6 binary source: 100 docs, md5 matches driver-side digest") {
    val rows = run("x6_binary_source").collect()
    assert(rows.length == 100)
    val doc0 = Tables.documents(spark, sf)
      .where(col("doc_id") === 0).head.getAs[String]("text")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(doc0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.find(_.getLong(0) == 0L).get.getString(2) == md)
  }

  test("s7 foreachBatch partial-aggregate table equals batch aggregation") {
    import org.apache.spark.sql.types.DecimalType
    val streamed = run("s7_stream_foreach_batch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sv"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch)
  }

  test("x7 pixel stats: doc 0 figures match a direct byte walk") {
    val doc0 = Tables.documents(spark, sf)
      .where(col("doc_id") === 0).head.getAs[String]("text")
    val px = doc0.map(_.toLong)
    val r = run("x7_pixel_stats").where(col("doc_id") === 0).head
    assert(r.getLong(1) == px.length)
    assert(math.abs(r.getDouble(2) -
      BigDecimal(px.sum.toDouble / px.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(r.getLong(3) == px.min && r.getLong(4) == px.max)
    val thumb = px.zipWithIndex.filter(_._2 % 16 == 0).map(_._1).sum
    assert(r.getLong(9) == thumb)
  }

  test("s8 custom state: per-user profile equals the batch profile") {
    import org.apache.spark.sql.types.DecimalType
    val streamed = run("s8_stream_custom_state").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        min(expr("ts div 1000")).as("f"), max(expr("ts div 1000")).as("l"),
        round(sum(col("value").cast(DecimalType(18, 6))).cast("double"), 6)
          .as("sv"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(streamed == batch)
  }

  test("x8 partitioned source: scan prunes to the filtered partition") {
    val df = run("x8_partitioned_source")
    val scans = df.queryExecution.executedPlan.collectLeaves()
    val scanStr = scans.map(_.toString).mkString("\n")
    // partition filter on event_type must reach the file scan
    assert(scanStr.contains("PartitionFilters") &&
      scanStr.contains("purchase"), s"no partition pruning in:\n$scanStr")
    assert(df.count() > 0)
  }

  test("r33 null-safe join keeps the null-key rows") {
    val rows = run("r33_null_handling").collect()
    val nullRows = rows.filter(_.getString(1) == "(null)")
    assert(nullRows.nonEmpty, "null keys dropped by the null-safe join")
    assert(nullRows.forall(r =>
      r.getString(2) == "x" && r.getString(3) == "none" &&
        r.getString(4) == "t_null"))
  }

  test("r34 window extras: quartiles partition evenly, pr in [0,1]") {
    val rows = run("r34_window_extras").collect()
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 4))
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // last_value over the full frame equals the partition max orderkey
    val byPrio = rows.groupBy(_.getString(1))
    byPrio.foreach { case (_, rs) =>
      val maxKey = rs.map(_.getLong(0)).max
      assert(rs.forall(_.getLong(8) == maxKey))
    }
  }

  test("r39 hll: merged and direct sketch estimates within 5% of exact") {
    val r = run("r39_hll_sketch").head
    val exact = Tables.events(spark, sf)
      .select(countDistinct("user_id")).head.getLong(0)
    assert(r.getLong(0) == exact, "n_exact column disagrees with direct count")
    assert(r.getInt(1) == 1, "merged (union) estimate outside 5% of exact")
    assert(r.getInt(2) == 1, "direct estimate outside 5% of exact")
  }

  test("m4 clusters: reps are component minima and respect the pair edges") {
    val labels = run("m4_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every rep is <= its member and is its own rep (idempotent)
    labels.foreach { case (doc, rep) =>
      assert(rep <= doc && labels(rep) == rep, s"bad rep $rep for $doc")
    }
    // both endpoints of every candidate pair share a cluster
    val pairs = run("m1_minhash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("m4 cache: a dead cached entry is detected and rebuilt") {
    // Reference result from the healthy path
    val before = run("m4_dedup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    // Simulate executor loss: poison the cache entry with a frame whose
    // evaluation fails (a parquet dir deleted after plan creation — the
    // same observable as severed localCheckpoint blocks).
    val dir = graft.util.TempDirs.create("graft_m4_poison")
    spark.range(1).select(col("id").as("doc_id"), col("id").as("cluster_rep"))
      .write.mode("overwrite").parquet(dir.toString + "/p")
    val poisoned = spark.read.parquet(dir.toString + "/p")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(dir.toString + "/p"))
    val key = spark.sparkContext.applicationId + "|" + sf
    queries.TextQueries.m4Cache.put(key, poisoned)
    // The consumer must not see the dead entry: probe fails → rebuild
    val after = run("m4_dedup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(after.toSeq == before.toSeq,
      "rebuild after cache invalidation changed the clustering")
    assert(queries.TextQueries.m4Cache(key) ne poisoned,
      "poisoned entry still cached")
  }

  test("r43 range-bin join plans as an equi-join, never a cartesian") {
    val plan = run("r43_range_bin_join").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to all-pairs:\n$plan")
    assert(plan.contains("bin"), s"no bin key in plan:\n$plan")
  }

  test("e6 sq8: quantized+reranked top-10 recalls the exact top-10") {
    val sq = run("e6_sq8_search").collect().map(_.getLong(0)).toSet
    val exact = run("v1_knn").collect().map(_.getLong(0)).toSet
    assert((sq intersect exact).size >= 8,
      s"SQ8 recall too low: ${(sq intersect exact).size}/10")
  }

  test("x10 shingle UDTF: null and short inputs emit nothing, counts add up") {
    graft.extensions.GraftExtensions.register(spark)
    import spark.implicits._
    Seq(Some("a b c d"), Some("a b"), None)
      .toDF("text").createOrReplaceTempView("sh_t")
    val rows = spark.sql(
      """SELECT shingle FROM sh_t
        |LATERAL VIEW text_shingles(text, 3) t AS shingle""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("a b c", "b c d"))
  }

  test("p4 kmeans: deterministic across fits, covers every vector") {
    val a = run("p4_kmeans_ivf").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = run("p4_kmeans_ivf").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._2).sum == Tables.embeddings(spark, sf).count())
    assert(a.length <= 10 && a.forall(_._2 > 0))
  }

  test("r26 moments: spark population skew/kurtosis definitions hold") {
    // closed-form check on a tiny in-memory column
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 4.0, 8.0)
    val r = xs.toDF("x").agg(
      skewness(col("x")), kurtosis(col("x"))).head
    val m = xs.sum / 4
    def mom(k: Int) = xs.map(x => math.pow(x - m, k)).sum / 4
    assert(math.abs(r.getDouble(0) - mom(3) / math.pow(mom(2), 1.5)) < 1e-9)
    assert(math.abs(r.getDouble(1) - (mom(4) / (mom(2) * mom(2)) - 3)) < 1e-9)
  }
}
