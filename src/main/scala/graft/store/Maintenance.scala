package graft.store

/** OPTIMIZE-when policy for [[QuantIndex.maintain]] — the declarative
  * form of the maintenance loop a 100 TB operator would otherwise
  * hand-sequence per table (compact → audit → retrain). The reference
  * has no maintenance surface at all: every shard rewrites its entire
  * FAISS binary on each `save_index` (`shard/shard_node.py:135-139`)
  * and never measures recall drift; here both actions are triggered by
  * MEASURED state — live-file counts from the commit log and a fresh
  * recall audit — and each rewrite stays scoped to the region that
  * tripped its trigger.
  *
  * @param maxFilesPerCell compaction trigger: a cell whose LIVE file
  *   count (from the commit log, not a listing) exceeds this is
  *   rewritten; cells at/below it are untouched — their files are not
  *   read, not rewritten, and not in the rewrite's read set, so a
  *   concurrent rewrite elsewhere in the table still merges.
  * @param targetRowsPerFile sizing for the compacted files (the
  *   [[QuantIndex.compact]] knob, applied per hot cell).
  * @param auditPanel query vectors for the fresh recall audit; empty
  *   disables the audit (and therefore the retrain trigger) — the
  *   report still FLAGS a stale curve so the operator knows the
  *   recall state is unmeasured.
  * @param auditK    k for the audit (recall@k).
  * @param auditNprobe probe depth the audit measures at — pick the
  *   depth production queries use, so the trigger watches the number
  *   users experience.
  * @param minRecall retrain trigger: a fresh audit below this
  *   retrains on the CURRENT corpus ([[QuantIndex.retrain]]) and
  *   re-audits, so the report carries the measured before/after pair.
  *   The default 0.0 never triggers (compaction-only maintenance).
  * @param vacuumGraceMs grace for the post-compaction vacuum and the
  *   retrain's superseded-snapshot sweep (0 in tests; the production
  *   default keeps in-flight readers alive).
  */
final case class MaintenancePolicy(
    maxFilesPerCell: Int = 8,
    targetRowsPerFile: Long = 1L << 20,
    auditPanel: Seq[Array[Double]] = Nil,
    auditK: Int = 10,
    auditNprobe: Int = 1,
    minRecall: Double = 0.0,
    vacuumGraceMs: Long = FileLog.DefaultVacuumGraceMs) {
  require(maxFilesPerCell >= 1, "maxFilesPerCell must be >= 1")
  require(targetRowsPerFile >= 1L, "targetRowsPerFile must be >= 1")
}

/** What [[QuantIndex.maintain]] decided and measured — every trigger's
  * input and outcome, so the decisions are auditable (and REPORT-able)
  * rather than silent.
  *
  * @param filesBefore    live data files at entry (commit-log truth).
  * @param filesAfter     live data files after maintenance; equals
  *   `filesBefore` when no cell tripped the compaction trigger, and
  *   reflects the retrained snapshot when a retrain ran.
  * @param compactedCells the cells whose file count exceeded the
  *   policy threshold — exactly the set rewritten (empty = trigger
  *   never fired).
  * @param curveStale     true when no persisted measured recall curve
  *   existed at entry (fresh build, or a mutation invalidated it) —
  *   the "recall state unmeasured" flag.
  * @param measuredRecall the fresh audit's recall@k at the policy's
  *   nprobe (None when the policy carried no panel).
  * @param retrained      whether the retrain trigger fired (audit
  *   below `minRecall`).
  * @param recallAfterRetrain the re-audit on the retrained index —
  *   the evidence the action helped (None unless `retrained`).
  */
final case class MaintenanceReport(
    filesBefore: Long,
    filesAfter: Long,
    compactedCells: Seq[Int],
    curveStale: Boolean,
    measuredRecall: Option[Double],
    retrained: Boolean,
    recallAfterRetrain: Option[Double]) {
  def compacted: Boolean = compactedCells.nonEmpty
}
