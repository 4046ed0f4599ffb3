package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Text-dedup scale smoke — the MinHash-band (m1) and PPJoin
  * prefix-filter (m5) 100 TB claims, asserted on data instead of plan
  * shape. The bench `documents` table is 5k rows; this generates
  * 500k- and 1M-doc corpora (≈5M/10M shingle-posting rows — 100–200×
  * the bench scale) with a PLANTED duplicate rate and checks the two
  * properties that make banded/prefix-filtered dedup viable at scale:
  *
  *  1. PAIR COUNTS ON THE MODEL — the corpus plants one dup pair per
  *     100 docs (doc 100k+1 repeats doc 100k's text) and draws all
  *     other words hash-uniform from a 1M vocabulary, so unrelated
  *     docs share no word TRIGRAM and m1's candidate count must be
  *     exactly planted(N) = N/100 PLUS the textbook LSH false-positive
  *     term: ~(10N)²/2P doc pairs collide on one mod-P shingle-hash
  *     value (J = 1/19) and band-match at the S-curve rate 4·J² ≈
  *     1.1% — a Θ(N²/P) term this spec PINS to its closed form (≤3×
  *     predicted), so any unmodeled candidate channel (the
  *     stop-shingle blowup the prefix filter guards against, or a
  *     rank-correlated hash family — this spec caught one) fails the
  *     bound. m5 verifies candidates exactly (J=1/19 < 0.2), so its
  *     RESULT must equal the planted count exactly.
  *
  *  2. SHUFFLE-VOLUME LINEARITY — total shuffle records/bytes written
  *     across every exchange in the physical plan scale ≤2.5× when
  *     the corpus doubles (read off the executed plan's
  *     ShuffleExchange metrics; AQE disabled for the measurement so
  *     stages aren't re-wrapped). This is the "no shuffle becomes the
  *     bottleneck at 1000×" check: a posting-list self-join without
  *     the prefix filter is Σ|posting|² and fails it on the first
  *     doubling.
  *
  * m5 ≡ m1-planted-count also re-proves the prefix-filter
  * LOSSLESSNESS lemma at 200× the scale Round4Spec pins it.
  */
class TextScaleSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val N = 500000L

  /** Synthetic corpus: 12 words/doc, words = decimal strings of
    * hash(seed, i) mod 1e6; docs with id ≡ 1 (mod 100) reuse their
    * predecessor's seed (exact text dup ⇒ Jaccard 1 pair). Fully
    * expression-generated — nothing transits the driver.
    */
  private def corpus(n: Long): DataFrame = {
    val seed = col("id") -
      when(pmod(col("id"), lit(100L)) === 1L, 1L).otherwise(0L)
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(11)),
        i => pmod(hash(seed, i), lit(1000000)).cast("string"))).as("text"),
      lit("en").as("lang"),
      lit("web").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** Write `n` docs as a Tables-compatible sf dir and return its path. */
  private def sfDir(n: Long): String = {
    val dir = graft.util.TempDirs.create(s"graft_textscale_$n").toString
    corpus(n).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val dir1 = sfDir(N)
  private lazy val dir2 = sfDir(2 * N)

  /** Shuffle records/bytes written, summed over every exchange in an
    * EXECUTED plan (AQE must be off so exchanges aren't re-wrapped).
    */
  private def shuffleMetrics(
      df: org.apache.spark.sql.DataFrame): (Long, Long) = {
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

  /** Run a registered query with AQE off, returning (rowCount,
    * shuffle records written, shuffle bytes written).
    */
  private def measure(name: String, dir: String): (Long, Long, Long) =
    withAqeOff {
      val df = queries.Registry.all.find(_.name == name).get.run(spark, dir)
      val rows = df.count()
      // count() re-plans; execute the real query once for its metrics
      val df2 = queries.Registry.all.find(_.name == name).get.run(spark, dir)
      df2.collect()
      val (rec, by) = shuffleMetrics(df2)
      (rows, rec, by)
    }

  test("m1/m5: planted-dup pair counts and shuffle volume scale linearly") {
    val expected1 = N / 100      // ids 1, 101, 201, …
    val expected2 = 2 * N / 100

    for (q <- Seq("m1_minhash_pairs", "m5_jaccard_inverted")) {
      val t0 = System.nanoTime()
      val (n1, rec1, by1) = measure(q, dir1)
      val t1 = System.nanoTime()
      val (n2, rec2, by2) = measure(q, dir2)
      val t2 = System.nanoTime()
      info(f"$q: N pairs=$n1%,d (rec=$rec1%,d, ${by1 / 1e6}%.1f MB, " +
        f"${(t1 - t0) / 1e9}%.1fs) 2N pairs=$n2%,d (rec=$rec2%,d, " +
        f"${by2 / 1e6}%.1f MB, ${(t2 - t1) / 1e9}%.1fs)")

      // No planted dup may be lost (identical text ⇒ identical
      // signature ⇒ all bands match). m1 additionally carries the
      // S-curve false positives; m5's exact verification removes them.
      def fpPredicted(n: Long): Double = {
        val shingles = 10.0 * n
        val collidingPairs = shingles * shingles / (2.0 * 1000000007.0)
        collidingPairs * 4.0 / 361.0 // bands · J², J = 1/19
      }
      val slack1 = if (q.startsWith("m1")) (3 * fpPredicted(N)).toLong else 0L
      val slack2 = if (q.startsWith("m1")) (3 * fpPredicted(2 * N)).toLong else 0L
      assert(n1 >= expected1 && n1 <= expected1 + slack1,
        s"$q at N: $n1 pairs, expected $expected1 planted (+$slack1 S-curve)")
      assert(n2 >= expected2 && n2 <= expected2 + slack2,
        s"$q at 2N: $n2 pairs, expected $expected2 planted (+$slack2 S-curve)")

      // shuffle volume must not grow super-linearly on doubling
      assert(rec2 <= rec1 * 5 / 2,
        s"$q shuffle records grew ${rec2.toDouble / rec1}x on a 2x corpus")
      assert(by2 <= by1 * 5 / 2,
        s"$q shuffle bytes grew ${by2.toDouble / by1}x on a 2x corpus")
    }
  }

  /** d32 (exact-substring dedup, Lee et al. 2022): its own corpus —
    * 30 words/doc (≥ K=15, so grams exist), planted full-text dup per
    * 100 docs, all other words hash-uniform over a 1M vocabulary so an
    * unrelated 15-gram match needs 15 consecutive word collisions
    * (p ≈ 0). Closed form: each dup PAIR yields one maximal span in
    * BOTH members — 16 overlapping gram hits (p = 1..16) merged into
    * exactly [start_tok = 1, n_tok = 30] — so the island merge, not
    * just the gram join, is pinned. Shuffle volume (gram groupBy +
    * join-back + per-doc window) must scale ≤2.5× on a 2× corpus: the
    * blocked form's cost is O(corpus·K), never all-pairs.
    */
  test("d32: planted-duplicate spans are exact and shuffles scale linearly") {
    val n3 = 200000L
    def corpus30(n: Long): DataFrame = {
      val seed = col("id") -
        when(pmod(col("id"), lit(100L)) === 1L, 1L).otherwise(0L)
      spark.range(n).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(29)),
          i => pmod(hash(seed, i), lit(1000000)).cast("string"))).as("text"),
        lit("en").as("lang"),
        lit("web").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    def dirOf(n: Long): String = {
      val dir = graft.util.TempDirs.create(s"graft_d32scale_$n").toString
      corpus30(n).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    def stats(n: Long): (Long, Long, Long, Long) = withAqeOff {
      val dir = dirOf(n)
      val q = queries.Registry.all.find(_.name == "d32_substring_dedup").get
      val agg = q.run(spark, dir)
        .agg(count(lit(1)).as("spans"),
          sum(when(col("start_tok") === 1L && col("n_tok") === 30L, 0L)
            .otherwise(1L)).as("malformed"))
      val row = agg.collect()(0)
      val (rec, by) = shuffleMetrics(agg)
      // d33 on the same corpus: the REMOVAL pass keeps the owner (the
      // lower doc_id of each planted pair), so exactly n/100 docs are
      // touched, each losing its whole 30-token text (kept_fp = 0)
      val d33 = queries.Registry.all.find(_.name == "d33_substring_removal")
        .get.run(spark, dir)
        .agg(count(lit(1)).as("touched"),
          sum(when(col("n_toks_removed") === 30L &&
            col("n_toks_kept") === 0L && col("kept_fp") === 0L, 0L)
            .otherwise(1L)).as("bad"))
        .collect()(0)
      assert(d33.getLong(0) == n / 100 && d33.getLong(1) == 0,
        s"d33 at $n docs: touched=${d33.getLong(0)} bad=${d33.getLong(1)}, " +
          s"expected ${n / 100} fully-excised non-owners")
      (row.getLong(0), row.getLong(1), rec, by)
    }
    val t0 = System.nanoTime()
    val (spans1, bad1, rec1, by1) = stats(n3)
    val t1 = System.nanoTime()
    val (spans2, bad2, rec2, by2) = stats(2 * n3)
    val t2 = System.nanoTime()
    info(f"d32: N spans=$spans1%,d (rec=$rec1%,d, ${by1 / 1e6}%.1f MB, " +
      f"${(t1 - t0) / 1e9}%.1fs) 2N spans=$spans2%,d (rec=$rec2%,d, " +
      f"${by2 / 1e6}%.1f MB, ${(t2 - t1) / 1e9}%.1fs)")
    // both members of each planted pair report exactly one maximal
    // span covering the whole 30-token text
    assert(spans1 == 2 * (n3 / 100) && bad1 == 0,
      s"d32 at N: $spans1 spans ($bad1 malformed), expected ${2 * (n3 / 100)}")
    assert(spans2 == 2 * (2 * n3 / 100) && bad2 == 0,
      s"d32 at 2N: $spans2 spans ($bad2 malformed)")
    assert(rec2 <= rec1 * 5 / 2,
      s"d32 shuffle records grew ${rec2.toDouble / rec1}x on a 2x corpus")
    assert(by2 <= by1 * 5 / 2,
      s"d32 shuffle bytes grew ${by2.toDouble / by1}x on a 2x corpus")
  }

  /** d10 (chunk dedup, the CCNet paragraph-level shape): at W=8 every
    * 12-word doc yields exactly one chunk (its first 8 words), so the
    * planted structure gives a closed-form answer — every doc
    * surfaces, every non-dup doc keeps its chunk, every planted dup
    * keeps none (its predecessor owns the chunk). No S-curve term
    * here: the dedup key is the exact chunk string, so the count
    * check is exact at 1M docs, and the chunk-keyed window + doc
    * groupBy must shuffle linearly.
    */
  test("d10: chunk dedup exact keep-counts and linear shuffles at 1M docs") {
    def stats(dir: String): (Long, Long, Long, Long, Long) = withAqeOff {
      val agg = queries.Registry.all.find(_.name == "d10_chunk_dedup").get
        .run(spark, dir)
        .agg(count(lit(1)).as("docs"), sum("n_chunks").as("chunks"),
          sum("n_kept").as("kept"))
      // collect(), not head(): head() executes a separate limit(1)
      // plan and would leave agg's own exchanges unexecuted (metrics 0)
      val row = agg.collect()(0)
      val (rec, by) = shuffleMetrics(agg)
      assert(rec > 0, "d10 must shuffle (chunk window + doc groupBy)")
      (row.getLong(0), row.getLong(1), row.getLong(2), rec, by)
    }
    val (docs1, chunks1, kept1, rec1, by1) = stats(dir1)
    val (docs2, chunks2, kept2, rec2, by2) = stats(dir2)
    info(f"d10: N docs=$docs1%,d kept=$kept1%,d (rec=$rec1%,d, " +
      f"${by1 / 1e6}%.1f MB) 2N docs=$docs2%,d kept=$kept2%,d " +
      f"(rec=$rec2%,d, ${by2 / 1e6}%.1f MB)")
    assert(docs1 == N && chunks1 == N && kept1 == N - N / 100,
      s"d10 at N: docs=$docs1 chunks=$chunks1 kept=$kept1")
    assert(docs2 == 2 * N && chunks2 == 2 * N && kept2 == 2 * N - 2 * N / 100,
      s"d10 at 2N: docs=$docs2 chunks=$chunks2 kept=$kept2")
    assert(rec2 <= rec1 * 5 / 2,
      s"d10 shuffle records grew ${rec2.toDouble / rec1}x on a 2x corpus")
    assert(by2 <= by1 * 5 / 2,
      s"d10 shuffle bytes grew ${by2.toDouble / by1}x on a 2x corpus")
  }
}
