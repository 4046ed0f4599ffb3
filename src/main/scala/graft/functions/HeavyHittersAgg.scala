package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Misra-Gries heavy-hitters sketch over a BIGINT key
  * column: at most `m` counters, each a LOWER BOUND on the key's true
  * frequency, with total undercount ≤ n/(m+1) (n = stream length).
  * The sketch family's frequency member, next to HLL (r7), KMV (r81)
  * and the quantile sketch (r7b): the distributed top-k-frequent
  * primitive — vocabulary heads, hot keys for salting decisions, URL
  * frequency caps — in one partial+final aggregation pass, O(m)
  * state per partition, no groupBy of the full key domain.
  *
  * reduce is textbook MG: increment a held counter, open a new one
  * while capacity lasts, else decrement ALL counters by 1 (each such
  * step retires m+1 stream items, hence the bound). merge sums
  * counter maps, then restores capacity by subtracting the (m+1)-th
  * largest summed count from every counter and dropping non-positives
  * — the Agarwal et al. "Mergeable Summaries" (PODS'12, §5) merge,
  * which keeps the n/(m+1) bound under ARBITRARY merge trees, so
  * estimates are partitioning-dependent but the GUARANTEE isn't.
  * Queries therefore hash-check an exact twin plus a flag certifying
  * the theorem (any key with true count > n/(m+1) is present and
  * undercounted by at most n/(m+1)); the raw estimates stay internal,
  * like r7's HLL estimate.
  */
final case class HeavyHittersAgg(m: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(m >= 1, s"capacity must be >= 1, got $m")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], k: Long): Map[Long, Long] =
    b.get(k) match {
      case Some(c) => b.updated(k, c + 1L)
      case None if b.size < m => b.updated(k, 1L)
      case None =>
        // decrement-all: retires this item plus one count of every
        // held key — m+1 stream items per step, hence err ≤ n/(m+1)
        b.iterator.collect { case (key, c) if c > 1L => key -> (c - 1L) }
          .toMap
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (summed.size <= m) summed
    else {
      // subtract the (m+1)-th largest count, keep strictly positive:
      // at most m survive, undercount grows by ≤ combined n/(m+1)
      val t = summed.valuesIterator.toArray.sortBy(-_).apply(m)
      summed.iterator.collect { case (k, c) if c > t => k -> (c - t) }.toMap
    }
  }

  override def finish(r: Map[Long, Long]): Map[Long, Long] = r

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}

object HeavyHittersAgg {
  /** Column form: `heavy_hitters(key, m)` → map<bigint, bigint> of at
    * most m (key → lower-bound count) entries.
    */
  def apply(key: Column, m: Int): Column = udaf(HeavyHittersAgg(m)).apply(key)
}
