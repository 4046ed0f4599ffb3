package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** The kNN-family queries plan as scan → codegen distance →
  * TakeOrderedAndProject: per-partition top-k heaps merged on the
  * driver, NO exchange at all — the property that makes single-query
  * search latency independent of corpus size at 100 TB (nothing is
  * redistributed; only k rows per partition move). SHUFFLE_DETAIL.json
  * measures these at zero shuffle records every bench run; this spec
  * pins the stronger structural fact (no ShuffleExchange node exists),
  * so a future edit that quietly introduces an exchange — a stray
  * repartition, an orderBy that stops collapsing into TakeOrdered, a
  * dropDuplicates before the top-k — fails here, not in a bench diff
  * three rounds later.
  */
class ZeroShuffleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val ZeroShuffle = Seq(
    "v1_knn", "v2_knn_clamp", "v3_knn_empty", "v4_cosine_knn",
    "v8_pruned_knn", "v11_filtered_knn", "v16_ip_knn", "v17_hybrid_search",
    "e1_ann_cosine_topk", "e12_bitq_hamming",
    // the round-14 funnels: coarse rank + exact re-rank are BOTH
    // TakeOrderedAndProject — adaptive retrieval must stay shuffle-free
    "e21_matryoshka_prefix", "e23_jl_funnel")

  private def shuffleNodes(p: SparkPlan): Seq[SparkPlan] = {
    val unwrapped = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    unwrapped.collect { case s: ShuffleExchangeLike => s }
  }

  test("kNN-family plans contain no shuffle exchange at all") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val failures = ZeroShuffle.flatMap { name =>
        val df = queries.Registry.all.find(_.name == name)
          .getOrElse(fail(s"unknown query $name")).run(spark, TestSpark.sf)
        df.collect()
        val nodes = shuffleNodes(df.queryExecution.executedPlan)
        if (nodes.isEmpty) None
        else Some(s"$name plans ${nodes.size} shuffle exchange(s)")
      }
      assert(failures.isEmpty, failures.mkString("; "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
