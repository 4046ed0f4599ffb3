package graft.store

/** The ONE certification rule for measured recall curves, shared by
  * every store's `searchAtRecall` and every facade adapter's
  * `probesFor` (it was copy-pasted six times until r21): a persisted
  * curve certifies ONLY the k it was audited at — recall@10 at a fixed
  * depth bounds neither recall@50 (more rows wanted than measured) nor
  * recall@5 (the misses can concentrate in the top 5), r14 ADVICE #1 —
  * so any other k yields None and the caller takes its
  * probe-everything/exact path. Changing the rule (per-k curves, a
  * one-sided guarantee) is a change HERE, not a six-site hunt.
  */
object RecallCurves {

  /** Smallest 1-based depth whose measured recall meets `minRecall`,
    * ONLY when `curve` (as `(auditedK, recallPerDepth)`) was audited
    * at exactly `k`. None = not certifiable: no curve, a different
    * audited k, or a target above every measured point.
    */
  def certifiedDepth(curve: Option[(Int, Seq[Double])], k: Int,
      minRecall: Double): Option[Int] =
    curve match {
      case Some((auditedK, c)) if auditedK == k =>
        val i = c.indexWhere(_ >= minRecall)
        if (i < 0) None else Some(i + 1)
      case _ => None
    }
}
