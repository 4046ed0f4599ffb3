package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory scale audit: builds the physical plan of EVERY
  * batch query in the registry and asserts none of them degenerate
  * into an all-pairs join. Flagship-by-flagship plan pins live in
  * Round3/4/5Spec; this is the blanket rule that keeps FUTURE queries
  * honest — a new query that plans a CartesianProduct fails here
  * before it ever reaches the driver gate.
  *
  * Streaming queries (s*) are excluded: materializing their plan runs
  * the stream end-to-end; their shapes are covered by
  * StreamingSemanticsSpec and the gate.
  *
  * BroadcastNestedLoopJoin is allowed only on an explicit whitelist
  * of queries whose nested loop is a deliberate 1-row or k-row
  * broadcast (global-threshold scalar, bounded radius/query sets) —
  * each is O(corpus × bounded constant), not O(n²).
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  /** Queries whose BroadcastNestedLoopJoin is a bounded broadcast by
    * construction (see docs/PLANS.md notes).
    */
  private val bnljAllowed = Set(
    "v6_batch_knn",       // 5 broadcast query vectors × corpus scan
    "e5_batch_knn_agg",   // same 5-query broadcast, TopKAgg form
    "e7_maxsim",          // bounded multi-vector query set broadcast
    "v18_batch_radius",   // 5 broadcast radius queries × corpus scan
    "x16_featurize_search", // 5 broadcast query features × corpus
    "x23_neural_knn",     // 5 broadcast featurized queries × corpus
    "r46_cross_join",     // explicit tiny-dim cross join (5×5)
    "p8_pmi_collocations", // 1-row token-total broadcast
    "r39_hll_sketch",     // 1-row sketch × 1-row sketch merge
    "r67_tpch_q11",       // 1-row global threshold, Cross BuildRight
    "r62_tpch_q15",       // 1-row max-revenue scalar (plan varies
                          // with AQE exchange reuse across runs)
    "e11_semdedup",       // 16 broadcast centroids × corpus scan
    "d21_dsir_weights",   // 1-row corpus-baseline broadcast
    "d22_bigram_fluency", // 1-row vocab-size + 1-row global-mean
    "p10_curation_funnel", // d21's 1-row baseline inside the funnel
    "r78_triangle_count", // three 1-row count aggregates combined
    "m8_lsh_audit",       // 10 broadcast query vectors × corpus scan
    "d25_bm25",           // 1-row N/avgdl corpus-stats broadcast
    "r81_kmv_distinct",   // 1-row sketch × 1-row exact-count combine
    "v20_rrf_fusion",     // inherits d25's 1-row corpus-stats broadcast
    "e18_ivf_recall_audit", // 10 broadcast panel queries × corpus scan
    "d27_nb_langid",      // 5-row class table + 1-row vocab-size broadcasts
    "e22_hard_negatives", // 1-in-25 anchor-panel broadcast; swaps to e17's
                          // salted candidate join at scale (see scaladoc)
    "r83_heavy_hitters"   // 1-row error-bound broadcast (r81's shape)
  )

  test("no batch query plans a CartesianProduct; BNLJ only where bounded") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    // structural exclusion: every query carries its own streaming flag
    // (materializing a streaming query's plan runs the stream)
    graft.queries.Registry.all
      .filterNot(_.streaming)
      .foreach { q =>
        val plan =
          try q.run(spark, sf).queryExecution.executedPlan.toString
          catch {
            case e: Throwable =>
              fail(s"${q.name}: plan construction failed: ${e.getMessage}")
          }
        if (plan.contains("CartesianProduct"))
          offenders += s"${q.name}: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(q.name))
          offenders += s"${q.name}: unlisted BroadcastNestedLoopJoin"
      }
    assert(offenders.isEmpty,
      s"plans that would not survive scale:\n${offenders.mkString("\n")}")
  }
}
