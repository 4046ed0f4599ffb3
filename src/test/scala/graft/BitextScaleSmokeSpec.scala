package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.lsh.{LshConfig, LshModel}

/** e20 bitext-mining scale smoke — the claim the r10 verdict asked to
  * PIN after the crossJoin was index-routed: with the bucket count
  * scaling with the corpus (B ∝ n, the production knob), the pair
  * pass's volume and shuffle bytes grow LINEARLY on a corpus
  * doubling, because sum_b |en_b|·|fr_b| ≈ (n/2)²/B. The old
  * crossJoin+checkpoint shape grew 4× per doubling (and materialized
  * the pair matrix); this spec fails on any regression back to it —
  * and also asserts no CartesianProduct / BNLJ anywhere in the
  * executed plan (the blocked join must stay an equi-join).
  *
  * Corpus: synthetic en/fr docs with hash-derived 64-d embeddings
  * (iid sign bits, so mod-B sign-LSH buckets spread uniformly);
  * B = 32 at n = 20k docs, B = 64 at 2n (1 hash fn per table keeps
  * totalBits = numHashTables ≤ 64, the Long-fold bound).
  */
class BitextScaleSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val N = 20000L

  private def docs(n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2L)) === 0L, lit("en"))
        .otherwise(lit("fr")).as("lang"))

  private def embs(n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => sin(hash(col("id"), i).cast("double"))).as("embedding"))

  private def modelFor(buckets: Int): LshModel =
    LshModel(LshConfig(numHashFunctions = 1, numHashTables = buckets,
      dim = 64, seed = 99L))

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def shuffleMetrics(df: DataFrame): (Long, Long) = {
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

  private def measure(n: Long, buckets: Int): (Long, Long, Long, String) =
    withAqeOff {
      val df = queries.Round13Queries.bitextMargin(
        docs(n), embs(n), modelFor(buckets))
      df.collect()
      val (rec, by) = shuffleMetrics(df)
      val rows = df.count()
      (rows, rec, by, unwrap(df.queryExecution.executedPlan).toString)
    }

  test("e20 pair pass: shuffle volume linear when B scales with the corpus") {
    val t0 = System.nanoTime()
    val (rows1, rec1, by1, plan1) = measure(N, 32)
    val t1 = System.nanoTime()
    val (rows2, rec2, by2, plan2) = measure(2 * N, 64)
    val t2 = System.nanoTime()
    info(f"n=$N B=32: $rows1%,d mined (rec=$rec1%,d, ${by1 / 1e6}%.1f MB, " +
      f"${(t1 - t0) / 1e9}%.1fs); 2n B=64: $rows2%,d (rec=$rec2%,d, " +
      f"${by2 / 1e6}%.1f MB, ${(t2 - t1) / 1e9}%.1fs)")

    // every en doc with >=1 bucket-mate mines a pair; with B = n/625
    // a bucket is essentially never en-empty, so rows ≈ en count
    assert(rows1 > N / 2 * 9 / 10, s"too few mined pairs at N: $rows1")
    assert(rows2 > N * 9 / 10, s"too few mined pairs at 2N: $rows2")

    // THE pin: doubling corpus with doubled buckets must not grow
    // shuffle super-linearly (the crossJoin shape grew 4x)
    assert(rec2 <= rec1 * 5 / 2,
      s"pair-pass shuffle records grew ${rec2.toDouble / rec1}x on 2x corpus")
    assert(by2 <= by1 * 5 / 2,
      s"pair-pass shuffle bytes grew ${by2.toDouble / by1}x on 2x corpus")

    // and the blocked join stays an equi-join — no all-pairs operator
    for ((plan, tag) <- Seq((plan1, "n"), (plan2, "2n"))) {
      assert(!plan.contains("CartesianProduct"),
        s"$tag plan regressed to CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$tag plan regressed to BroadcastNestedLoopJoin")
    }
  }
}
