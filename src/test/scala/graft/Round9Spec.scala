package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 surface: LSH quality audit, BM25 ranking, BFS levels, and
  * BPE tokenizer training.
  */
class Round9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def run(name: String) =
    queries.Registry.all.find(_.name == name).get.run(spark, sf)

  test("m8: every bucket accounted for, hits bounded by 10 per query") {
    val rows = run("m8_lsh_audit").collect()
    assert(rows.nonEmpty)
    val nVecs = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(nVecs == spark.read.parquet(s"$sf/embeddings.parquet").count())
    val nQueries = rows.map(_.getAs[Long]("n_queries")).sum
    assert(nQueries == 10, s"expected the 10 audit queries, got $nQueries")
    rows.foreach { r =>
      val (q, h) = (r.getAs[Long]("n_queries"), r.getAs[Long]("n_hits"))
      assert(h <= q * 10, s"bucket ${r.get(0)}: $h hits for $q queries")
      val rec = r.getAs[Double]("recall_1probe")
      assert(rec >= 0.0 && rec <= 1.0)
      if (q > 0) assert(math.abs(rec - h.toDouble / (q * 10)) < 1e-6)
    }
  }

  test("m8: buckets computed natively once; audit reads the materialization") {
    // The bucket kernel itself is a native expression (no UDF, no
    // shuffle before it)...
    val bucketPlan = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("bucket",
        queries.VectorQueries.model.bucketCol(col("embedding")))
      .queryExecution.executedPlan.toString
    assert(bucketPlan.contains("vec_lsh_bucket"),
      s"native bucket kernel missing:\n$bucketPlan")
    assert(!bucketPlan.contains("Exchange"),
      s"bucket computation must not shuffle:\n$bucketPlan")
    // ...and the audit consumes the ONE materialized bucketed corpus
    // (checkpoint scan), never re-hashing per consumer.
    val q = queries.Registry.all.find(_.name == "m8_lsh_audit").get
    val plan = q.run(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"audit should read the materialized bucketed corpus:\n$plan")
    assert(!plan.contains("vec_lsh_bucket"),
      s"audit re-computes buckets instead of reusing the materialization:\n$plan")
  }

  test("d25: scores ordered, bounded, and only query-term docs appear") {
    val rows = run("d25_bm25").collect()
    assert(rows.length == 15)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.sameElements(scores.sorted.reverse), "not score-descending")
    assert(scores.forall(v => v > 0.0 && v < 100.0))
    // every returned doc really contains at least one query term
    val ids = rows.map(_.getAs[Long]("doc_id"))
    val matching = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id").isin(ids.map(Long.box): _*))
      .where(array_intersect(split(col("text"), " "),
        array(lit("vector"), lit("merge"), lit("window"))) =!= array())
      .count()
    assert(matching == ids.length,
      s"only $matching of ${ids.length} results contain a query term")
  }

  test("r80: level counts positive and frontier grows from the source") {
    val rows = run("r80_bfs_levels").collect()
    val byDist = rows.map(r => r.getAs[Int]("dist") -> r.getAs[Long]("n_nodes")).toMap
    assert(byDist(0) == 1, "BFS must start from exactly one source")
    assert(byDist.keySet.max <= 4)
    assert(byDist.values.forall(_ > 0))
  }

  test("p15: 8 merges, counts non-increasing, merged = lhs ++ rhs") {
    val rows = run("p15_bpe_train").collect()
    assert(rows.length == 8)
    val counts = rows.map(_.getAs[Long]("pair_n"))
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("lhs") + r.getAs[String]("rhs"))
    }
    // Each merge consumes pair occurrences; later merges can never be
    // MORE frequent than an earlier one was at selection time.
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"pair counts increased: ${counts.mkString(",")}")
    assert(rows.map(_.getAs[Int]("step")).toSeq == (1 to 8))
  }

  test("e17: salted kNN join equals unsalted bucket-restricted top-3") {
    import org.apache.spark.sql.expressions.Window
    val model = queries.VectorQueries.model
    val b = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("bucket", model.bucketCol(col("embedding")))
    val qs = b.where(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("bucket").as("qbucket"),
        col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("dd"), col("vec_id"))
    val expected = b.join(qs,
        col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.functions.VectorFunctions.l2sq(col("embedding"), col("qe")).as("dd"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
      .select(col("qid"), col("rk").cast("int").as("rank"), col("vec_id"),
        round(col("dd"), 6).as("dist"))
      .orderBy("qid", "rank").collect()
    val e17 = queries.Registry.all.find(_.name == "e17_knn_join").get
      .run(spark, sf)
    val got = e17.collect()
    assert(got.toSeq == expected.toSeq,
      s"salted join drifted from unsalted semantics (${got.length} vs ${expected.length} rows)")
    // Plan pin: the salted (bucket, salt) shuffle shape must actually
    // be exercised — without the hint AQE broadcasts the ~200-row
    // query side and the demo degenerates to a BroadcastHashJoin.
    val plan = e17.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"e17 must shuffle on (bucket, salt), not broadcast:\n$plan")
  }

  test("p16: encoding broadcasts the vocabulary and compresses words") {
    val q = queries.Registry.all.find(_.name == "p16_bpe_encode").get
    val df = q.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocabulary join must broadcast:\n$plan")
    df.collect().foreach { r =>
      val ratio = r.getAs[Double]("avg_tokens_per_word")
      // 8 merges on short words: between 1 (fully merged) and the
      // raw char count; the corpus words average ~5 chars.
      assert(ratio >= 1.0 && ratio <= 6.0, s"ratio $ratio out of range")
      assert(r.getAs[Long]("n_subtokens") >= r.getAs[Long]("n_words"))
    }
  }

  test("d26: block join is a hash join; distances bounded by threshold") {
    val q = queries.Registry.all.find(_.name == "d26_editdist_pairs_cap200").get
    val df = q.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"length blocking must stay an equi-join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dist = r.getAs[Long]("dist")
      assert(dist >= 0 && dist <= 100, s"dist $dist outside threshold")
    }
    // no duplicate pairs from the 3-block explode
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length ==
      rows.length)
  }

  test("s24: streaming encode matches the batch (p16) result exactly") {
    val batch = run("p16_bpe_encode").collect().toSeq
    val stream = run("s24_stream_bpe_encode").collect().toSeq
    assert(stream == batch, s"stream drift:\n$stream\nvs\n$batch")
  }

  test("x25: runtime partition pruning reaches the fact scan") {
    val q = queries.Registry.all.find(_.name == "x25_dpp_join").get
    val plan = q.run(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in the fact scan:\n$plan")
  }

  test("x26: struct projection prunes to the one read field") {
    val q = queries.Registry.all.find(_.name == "x26_nested_pruning").get
    val plan = q.run(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<meta:struct<source:string>>"),
      s"nested pruning did not reach the scan:\n$plan")
  }

  test("x27: COUNT/MIN/MAX served from parquet footers") {
    val q = queries.Registry.all.find(_.name == "x27_agg_pushdown").get
    val plan = q.run(spark, sf).queryExecution.executedPlan.toString
    // DSv2 parquet scans print "PushedAggregation: []" even when
    // nothing is pushed — assert the COUNT actually landed.
    assert(plan.contains("PushedAggregation: [COUNT"),
      s"aggregate pushdown did not reach the scan:\n$plan")
  }

  test("r82: variant strict get throws on type mismatch; try_ returns null") {
    import spark.implicits._
    val df = Seq("""{"k": "notanumber"}""").toDF("props")
    intercept[Exception] {
      df.select(expr("variant_get(parse_json(props), '$.k', 'bigint')"))
        .collect()
    }
    val r = df.select(
      expr("try_variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .collect().head
    assert(r.isNullAt(0), "try_variant_get must null out a type mismatch")
  }

  test("r81: KMV estimate lands within sketch error of the exact count") {
    val r = run("r81_kmv_distinct").collect().head
    val (exact, k, est) = (r.getAs[Long]("n_exact"), r.getAs[Long]("k"),
      r.getAs[Long]("kmv_est"))
    assert(k <= 128 && k > 0)
    // KMV standard error is ~1/sqrt(k) ≈ 9% at k=128; 50% is the
    // generous determinism-preserving bound.
    assert(r.getAs[Double]("rel_err") < 0.5,
      s"estimate $est too far from exact $exact")
  }

  test("p17: OLS over sufficient statistics - slope <= 0, r2 in [0,1]") {
    val rows = run("p17_zipf_fit").collect()
    assert(rows.length == 1)
    val r = rows.head
    // freq is non-increasing in rank, so the OLS slope of
    // ln(freq) ~ ln(rank) cannot be positive.
    assert(r.getAs[Double]("slope") <= 0.0)
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(r.getAs[Long]("n") > 0)
  }

  test("p15: windowed merge kernel == pure greedy fold on random inputs") {
    import spark.implicits._
    // Reference semantics: greedy left-to-right fold — merge when the
    // accumulator's last token is l and the current token is r.
    def greedy(toks: Seq[String], l: String, r: String): Seq[String] =
      toks.foldLeft(Vector.empty[String]) { (acc, t) =>
        if (acc.nonEmpty && acc.last == l && t == r)
          acc.init :+ (l + r)
        else acc :+ t
      }
    val rnd = new scala.util.Random(20260814L)
    val syms = Vector("a", "b", "ab", "c")
    val words = (0 until 60).map { i =>
      (s"w$i", 1L, Vector.fill(1 + rnd.nextInt(9))(syms(rnd.nextInt(syms.size))))
    }
    for ((l, r) <- Seq(("a", "a"), ("a", "b"), ("ab", "c"), ("b", "a"))) {
      val df = words.toDF("word", "n", "toks")
      val got = queries.Round9Queries.testApplyMerge(df, l, r)
        .collect().map(x => x.getAs[String]("word") ->
          x.getSeq[String](x.fieldIndex("toks")).toVector).toMap
      words.foreach { case (w, _, toks) =>
        val want = greedy(toks, l, r).toVector
        assert(got(w) == want,
          s"pair ($l,$r) word $w: toks=$toks got=${got(w)} want=$want")
      }
    }
  }

  test("p15: greedy merge handles the l==r run case exactly") {
    import spark.implicits._
    // aaaa -> greedy (a,a) gives [aa, aa]; aaa gives [aa, a].
    val types = Seq(("aaaa", 1L), ("aaa", 1L)).toDF("word", "n")
      .withColumn("toks",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
    val m = queries.Round9Queries.testApplyMerge(types, "a", "a")
      .collect().map(r => r.getAs[String]("word") ->
        r.getSeq[String](r.fieldIndex("toks"))).toMap
    assert(m("aaaa") == Seq("aa", "aa"), s"got ${m("aaaa")}")
    assert(m("aaa") == Seq("aa", "a"), s"got ${m("aaa")}")
  }

  test("d26: bag distance is a lower bound of levenshtein (prefilter lossless)") {
    // the r15 prefilter drops a pair only when bag > threshold; this
    // pins bag <= lev on random printable-ASCII strings, so a dropped
    // pair provably had lev > threshold and was already doomed to the
    // dist = -1 filter — identical result set by construction
    import spark.implicits._
    val rnd = new scala.util.Random(77L)
    def randStr(n: Int): String =
      (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    val pairs = (0 until 300).map { i =>
      val a = randStr(1 + rnd.nextInt(60))
      // half the pairs are near-duplicates (small true distance)
      val b = if (i % 2 == 0) randStr(1 + rnd.nextInt(60))
              else a.patch(rnd.nextInt(a.length), randStr(rnd.nextInt(4)), rnd.nextInt(2))
      (a, b)
    }
    val out = pairs.toDF("ta", "tb")
      .withColumn("ha", expr(
        "transform(sequence(32, 126), c -> length(ta) - length(replace(ta, char(c), '')))"))
      .withColumn("hb", expr(
        "transform(sequence(32, 126), c -> length(tb) - length(replace(tb, char(c), '')))"))
      .withColumn("bag", expr(
        """greatest(
          |  aggregate(zip_with(ha, hb, (x, y) -> greatest(x - y, 0)), 0, (acc, x) -> acc + x),
          |  aggregate(zip_with(ha, hb, (x, y) -> greatest(y - x, 0)), 0, (acc, x) -> acc + x))""".stripMargin))
      .withColumn("lev", expr("levenshtein(ta, tb)"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Int]("bag") <= r.getAs[Int]("lev"),
        s"bag > lev for ta=${r.getString(0)} tb=${r.getString(1)}")
    }
  }

  test("p15: fold merge == the pre-r15 relational merge on random words") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    val syms = Vector("a", "b", "c", "ab", "bc")
    val words = (0 until 80).map { i =>
      (s"w$i", 1L, Vector.fill(1 + rnd.nextInt(10))(syms(rnd.nextInt(syms.size))))
    }
    for ((l, r) <- Seq(("a", "a"), ("a", "b"), ("ab", "c"), ("c", "ab"), ("b", "a"))) {
      val df = words.toDF("word", "n", "toks")
      def toMapOf(out: org.apache.spark.sql.DataFrame) =
        out.collect().map(x => x.getAs[String]("word") ->
          x.getSeq[String](x.fieldIndex("toks")).toVector).toMap
      val fold = toMapOf(queries.Round9Queries.testApplyMerge(df, l, r))
      val rel = toMapOf(queries.Round9Queries.applyMergeRelational(df, l, r))
      words.foreach { case (w, _, toks) =>
        assert(fold(w) == rel(w),
          s"pair ($l,$r) word $w: toks=$toks fold=${fold(w)} rel=${rel(w)}")
      }
    }
  }
}
