package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-4 additions: plan-shape (scale-posture) and semantic
  * invariants for the completed TPC-H suite and the new pipeline
  * operators. Value equality is the driver's DuckDB gate; here we
  * assert the plans are the ones that survive 100×.
  */
class Round4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  def run(name: String) = SparkEntry.queries(name)(spark, sf)
  def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("q6 predicates reach the parquet scan") {
    val p = plan("r60_tpch_q6")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("l_discount"), s"discount filter not pushed:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"scan+agg query should have no wide shuffle:\n$p")
  }

  test("q21 plans EXISTS/NOT EXISTS as semi/anti joins on the equi key") {
    val p = plan("r65_tpch_q21")
    assert(p.contains("LeftSemi"), s"no semi join:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"correlated subqueries fell back to all-pairs:\n$p")
  }

  test("q2 min-per-part is a window, not a self-join") {
    val p = plan("r66_tpch_q2")
    assert(p.contains("Window"), s"no window min:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q11 serves both branches from one shuffle (ReuseExchange)") {
    val df = run("r67_tpch_q11")
    df.collect() // let AQE finalize the plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage") ||
      p.contains("TableCacheQueryStage"),
      s"per-part agg recomputed for the global total:\n$p")
  }

  test("q17/q19/q20 broadcast the filtered part side") {
    Seq("r63_tpch_q17", "r64_tpch_q19", "r68_tpch_q20").foreach { n =>
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"), s"$n: part side not broadcast")
      assert(!p.contains("CartesianProduct"), s"$n: cartesian product")
    }
  }

  test("d9 repetition is shuffle-free before the output sort") {
    val p = plan("d9_repetition")
    assert(!p.contains("Exchange hashpartitioning"),
      s"row-local operator should not hash-shuffle:\n$p")
  }

  test("v16 inner-product kNN plans as TakeOrderedAndProject") {
    val p = plan("v16_ip_knn")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not pushed:\n$p")
  }

  test("d8 masks every injected email and phone") {
    val rows = run("d8_pii_redact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(1)
      assert(t.contains("<EMAIL>") && t.contains("<PHONE>"), t.takeRight(80))
      assert(!t.contains("@") && !t.contains("+1-555-"), t.takeRight(80))
    }
  }

  test("d9 repetition ratio stays within [0, 1]") {
    val bad = run("d9_repetition")
      .where(col("rep_ratio") < 0.0 || col("rep_ratio") > 1.0).count()
    assert(bad == 0)
  }

  test("d10 keeps each distinct chunk exactly once corpus-wide") {
    val agg = run("d10_chunk_dedup")
      .agg(sum("n_kept").as("kept"), sum("n_chunks").as("total")).head
    val kept = agg.getLong(0); val total = agg.getLong(1)
    assert(kept > 0 && kept <= total)
    // kept must equal the number of distinct chunks in the corpus
    val distinctChunks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(explode(expr(
        "CASE WHEN size(t) >= 8 THEN transform(sequence(0, CAST(size(t)/8 AS INT) - 1), " +
          "i -> concat_ws(' ', slice(t, i*8+1, 8))) ELSE array() END")).as("c"))
      .select(countDistinct("c")).head.getLong(0)
    assert(kept == distinctChunks, s"kept=$kept distinct=$distinctChunks")
  }

  test("AQE splits a skewed join partition at runtime") {
    // 90% of the left side lands on key 0 — the planted-hot-key shape
    // that a static plan serializes into one straggler task. With the
    // skew thresholds scaled to test size, AQE must mark the join
    // skewed and split the hot partition.
    val s = spark
    import s.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val left = s.range(200000).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 997).as("k"),
        col("id").as("v"))
      val right = s.range(1000).select(col("id").as("k2"), (col("id") * 2).as("w"))
      val j = left.join(right, col("k") === col("k2"))
      // materialize THIS queryExecution (count() would plan a new one
      // and leave j's adaptive plan unfinalized)
      assert(j.collect().length > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("p5 capstone plans exactly three exchanges") {
    // dedup window (hash by redacted), pack window (hash by source —
    // which then also satisfies the (source, shard_id) aggregation's
    // distribution, so the group-by adds NO exchange), final sort
    // (range). More exchanges = a stage stopped reusing partitioning.
    val p = plan("p5_curation_pipeline")
    val n = "Exchange (hash|range)partitioning".r.findAllIn(p).size
    assert(n == 3, s"expected 3 exchanges, found $n:\n$p")
  }

  test("Observation collects pipeline metrics without a second pass") {
    // The curation pipeline wants row counts / token sums per stage
    // WITHOUT re-running stages; df.observe attaches metric
    // aggregates to the one materialization — free at any scale.
    import org.apache.spark.sql.Observation
    val obs = Observation("gate")
    val gated = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .observe(obs, count(lit(1)).as("rows_in"),
        sum(when(col("n_tok") >= 20, 1L).otherwise(0L)).as("rows_pass"))
      .where(col("n_tok") >= 20)
    val passed = gated.count()
    val m = obs.get
    assert(m("rows_pass") == passed, s"observed $m vs counted $passed")
    assert(m("rows_in").asInstanceOf[Long] >= passed)
  }

  test("bloom filter has no false negatives and bounded false positives") {
    // Completes the sketch trio (HLL r39, CMS above): the build-side
    // membership structure AQE's runtime-filter pushdown uses — the
    // semi-join pre-filter at 100 TB. df.stat.bloomFilter builds
    // per-partition and merges (one pass, associative).
    val keys = Tables.orders(spark, sf).select("o_custkey")
    val bf = keys.stat.bloomFilter("o_custkey", 1000, 0.03)
    val members = keys.distinct().collect().map(_.getLong(0))
    members.foreach(k => assert(bf.mightContain(k), s"false negative on $k"))
    val absentTried = (1000000L to 1002000L)
    val fp = absentTried.count(bf.mightContain)
    assert(fp <= absentTried.size * 0.1,
      s"false-positive rate implausibly high: $fp/${absentTried.size}")
  }

  test("text_trigram_distinct is SQL-callable via GraftExtensions") {
    graft.extensions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT text_trigram_distinct('a b a b a b c') AS n").head.getLong(0)
    // trigrams: "a b a","b a b","a b a","b a b","a b c" -> 3 distinct
    assert(r == 3L)
  }

  test("count-min sketch estimates are overestimates within eps*N") {
    // The mergeable heavy-hitter sketch (CMS) complements the HLL
    // (r39) and quantile sketches: per-partition sketches merge
    // associatively, so the build is one pass at any scale. CMS
    // guarantees est >= true and est <= true + eps*N w.p. 1-delta.
    val eps = 0.01; val delta = 0.01
    val df = Tables.orders(spark, sf).select("o_orderpriority")
    val cms = df.stat.countMinSketch("o_orderpriority", eps, delta, 42)
    val truth = df.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    truth.foreach { case (k, exact) =>
      val est = cms.estimateCount(k)
      assert(est >= exact, s"$k: est $est < exact $exact")
      assert(est <= exact + (eps * n).toLong + 1,
        s"$k: est $est exceeds error bound for exact $exact, N=$n")
    }
  }

  test("m5 inverted-index Jaccard equals m3 blocked all-pairs") {
    val m3 = run("m3_ngram_jaccard").collect().toSeq
    val m5 = run("m5_jaccard_inverted").collect().toSeq
    assert(m3 == m5, s"m3=${m3.take(5)} m5=${m5.take(5)}")
    assert(m3.nonEmpty)
  }

  test("v16 scores are exact dot products against the stored query") {
    val rows = run("v16_ip_knn").collect()
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    // Independently recompute each returned score on the driver from
    // the raw embeddings (bounded: 10 ids + the query vector) — this
    // checks the native VecDot path against plain Scala arithmetic.
    val ids = rows.map(_.getLong(0))
    val need = (ids :+ 0L).distinct
    val embs = Tables.embeddings(spark, sf)
      .where(col("vec_id").isin(need: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = embs(0L)
    rows.foreach { r =>
      val e = embs(r.getLong(0))
      var d = 0.0
      var i = 0
      while (i < q.length) { d += e(i).toDouble * q(i).toDouble; i += 1 }
      val expect = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(math.abs(r.getDouble(1) - expect.toDouble) <= 1e-6,
        s"vec ${r.getLong(0)}: got ${r.getDouble(1)}, recomputed $d")
    }
  }
}
