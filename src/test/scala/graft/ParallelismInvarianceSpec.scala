package graft

import org.scalatest.funsuite.AnyFunSuite

/** Results must not depend on the parallelism they were computed
  * with — THE portability property for a 100 TB cluster, where the
  * same query runs at 32 partitions in CI and tens of thousands in
  * production. Every floating aggregate computed by ordered fold, any
  * sketch that isn't truly mergeable, any top-k with unstable ties
  * breaks this; the repo's conventions (DECIMAL-cast sums, seeded
  * models, id tie-breaks, mergeable sketches) exist to guarantee it.
  * This spec pins it directly: a representative query slice re-run
  * under a different `spark.sql.shuffle.partitions` (and a prime one,
  * so hash co-partitioning never accidentally lines up) must produce
  * IDENTICAL rows.
  */
class ParallelismInvarianceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** One query family member per determinism hazard: ordered-fold
    * aggregation (r6, r26), window functions (r51), join+top-N (r31),
    * banded MinHash candidates (m1), windowed chunk dedup (d10),
    * brute-force ANN tie-breaks (e1), KMV/HLL-style sketches (r81),
    * BM25 scoring (d25), trained-tokenizer encode (p16), IVF recall
    * audit through the filtered-TopKAgg path (e18).
    */
  private val Sweep = Seq(
    "r6_tpch_q1", "r26_stats_agg", "r51_window_ignore_nulls", "r31_tpch_q3",
    "m1_minhash_pairs", "d10_chunk_dedup", "e1_ann_cosine_topk",
    "r81_kmv_distinct", "d25_bm25", "p16_bpe_encode",
    "e18_ivf_recall_audit")

  private def rows(name: String, parts: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      val df = queries.Registry.all.find(_.name == name)
        .getOrElse(fail(s"unknown query $name")).run(spark, TestSpark.sf)
      df.collect().map(_.toString).sorted.toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("query results are identical at 32 and 7 shuffle partitions") {
    val failures = Sweep.flatMap { q =>
      val a = rows(q, "32")
      val b = rows(q, "7")
      if (a == b) { info(s"$q: ${a.size} rows invariant"); None }
      else {
        val diff = (a.diff(b) ++ b.diff(a)).take(3)
        Some(s"$q differs across parallelism (${a.size} vs ${b.size} rows; e.g. $diff)")
      }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
