package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared in-batch key dedup for the four upsert surfaces
  * ([[graft.sources.ManifestScan.upsert]], [[VectorStore.upsert]],
  * [[QuantIndex.upsert]], and MultiTableStore via delete+add): a batch
  * carrying one key twice must apply exactly one row, and WHICH row
  * must not depend on the batch's partition layout.
  *
  * With `seqCol` the caller names the ordering column (a CDC sequence
  * number, an event timestamp) and the highest value wins —
  * deterministic for any partitioning. Without it, the fallback is
  * last-wins by `monotonically_increasing_id`, which follows row order
  * WITHIN a partition but is partition-layout-dependent across
  * partitions (documented; fine for single-partition batches and for
  * callers that don't carry duplicates). Ties on `seqCol` fall back to
  * the same positional id, keeping the single-partition determinism.
  */
private[graft] object Dedup {

  /** Once-per-JVM: the fallback-path determinism caveat is worth one
    * loud line, not one per micro-batch.
    */
  private val warned = new java.util.concurrent.atomic.AtomicBoolean(false)

  def lastWins(df: DataFrame, keyCol: String,
      seqCol: Option[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The multi-partition no-seqCol path picks a winner by physical
    // position, which depends on the batch's partition layout: warn
    // once (checking for actual duplicate keys would cost an extra
    // aggregation per upsert, so the warning is layout-gated only —
    // r14 ADVICE #3). Batches without duplicate keys are unaffected.
    // `!warned.get()` FIRST: the partition-count probe forces a
    // plan-to-RDD conversion, which must not recur on every micro-batch
    // of a long-running sink once the warning has already fired
    if (seqCol.isEmpty && !warned.get() && df.rdd.getNumPartitions > 1 &&
        warned.compareAndSet(false, true))
      System.err.println(
        s"[graft] upsert dedup on '$keyCol': multi-partition batch " +
          "without seqCol — if the batch carries duplicate keys, the " +
          "surviving row is partition-layout-dependent; pass seqCol " +
          "for a deterministic winner (warned once per JVM)")
    val withSeq = df.withColumn("__pos", monotonically_increasing_id())
    val order = seqCol match {
      case Some(s) => Seq(col(s).desc, col("__pos").desc)
      case None => Seq(col("__pos").desc)
    }
    withSeq
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(order: _*)))
      .where(col("__rn") === 1).drop("__rn", "__pos")
  }
}
