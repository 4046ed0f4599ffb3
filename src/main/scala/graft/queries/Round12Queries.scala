package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 queries: recall-targeted search on the QUANTIZED layout —
  * [[graft.store.QuantIndex]] gains the same measured-curve-driven
  * latency/recall knob v21 gave [[graft.store.VectorStore]], so the
  * IVF nprobe stops being a hand-tuned constant.
  */
object Round12Queries {

  /** e19's recall target: above the 1-probe measured recall on this
    * data (so the curve actually raises nprobe) and below 1.0's exact
    * degeneration — the choice the curve exists to make.
    */
  private val E19Target = 0.8

  /** Late-bound oracle: the chosen nprobe — hence the probed cell set
    * — depends on the curve MEASURED at the target scale factor.
    */
  @volatile private var e19Oracle: Option[String] = None

  val all: Seq[Q] = Seq(

    // E19 — recall-targeted IVF kNN: audit the recall-vs-nprobe curve
    // over a 10-query panel (ONE corpus scan — exact and every probe
    // depth are FILTERed TopKAggs on the same pass), persist it inside
    // the index snapshot, then search with the smallest nprobe whose
    // MEASURED recall meets the 0.8 target. The oracle replays the
    // final search from the injected trained centroids at the chosen
    // nprobe — so the curve-driven choice is hash-checked end to end.
    Q("e19_recall_target_ivf",
      (s, d) => {
        val idx = QuantCache.forDir(s, d)
        val panel = (0L until 10L).map(VectorQueries.qvec(s, d, _))
        idx.auditRecallCurve(panel, k = 10)
        val q = VectorQueries.qvec(s, d, 0)
        val nprobe = idx.nprobeForRecall(E19Target)
        e19Oracle = Some(QuantCache.ivfSqlAtNprobe(idx.model, nprobe))
        idx.searchAtRecall(q, 10, E19Target)
          .select(col("id").as("vec_id"),
            round(col("dist"), 6).as("dist"),
            lit(nprobe).cast("int").as("nprobe"))
      },
      None,
      lateOracle = () => e19Oracle)
  )
}
