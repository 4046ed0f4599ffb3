package graft.queries

import org.apache.spark.sql.functions._
import graft.store.QuantTier

/** Round-20 queries: recall-targeted re-rank budgets for the ADC
  * tiers — the coarseN knob gets the same measured-curve treatment
  * e19 gave nprobe (r13 verdict task #6). The reference exposes no
  * recall knob at all (its `top_k` is the only parameter,
  * `coordinator/coordinator.py:210`); here the budget is chosen from
  * a recall curve MEASURED on the index's own snapshot and
  * invalidated by any mutation or retrain.
  */
object Round20Queries {

  /** e25's recall target: above the coarseN=100 measured recall on
    * this data (so the curve actually raises the budget) and below
    * exact's 1.0 — the choice the curve exists to make.
    */
  private val E25Target = 0.7

  /** Late-bound oracle: the chosen budget — hence the candidate set —
    * depends on the curve MEASURED at the target scale factor; the
    * exact-scan fallback (no measured point meets the target) has its
    * own replayed twin.
    */
  @volatile private var e25Oracle: Option[String] = None

  val all: Seq[Q] = Seq(

    // E25 — recall-targeted OPQ kNN: audit the recall-vs-coarseN
    // curve over a 10-query panel (ONE corpus scan — the exact top-k
    // and one top-maxDepth ADC aggregate per query; every depth is a
    // prefix slice), persist it inside the index snapshot, then
    // search with the smallest MEASURED budget meeting the 0.7
    // target. The oracle replays the full rotate→encode→ADC→re-rank
    // pipeline at the chosen budget (injected late), so the
    // curve-driven choice itself is hash-checked; the exact fallback
    // branch (target unreachable on this corpus) is replayed too.
    Q("e25_recall_target_opq",
      (s, d) => {
        val idx = QuantCache.forDir(s, d)
        val panel = (0L until 10L).map(VectorQueries.qvec(s, d, _))
        idx.auditAdcRecallCurve(panel, k = 10, tier = QuantTier.Opq)
        val q = VectorQueries.qvec(s, d, 0)
        val (df, n) = idx.searchAdcAtRecall(q, 10, E25Target, QuantTier.Opq)
        e25Oracle = Some(
          if (n > 0) QuantCache.opqSqlAt(idx.model, n)
          else QuantCache.exactFallbackSql)
        df.select(col("id").as("vec_id"),
          round(col("dist"), 6).as("dist"),
          lit(n).cast("int").as("coarse_n"))
      },
      None,
      lateOracle = () => e25Oracle))
}
