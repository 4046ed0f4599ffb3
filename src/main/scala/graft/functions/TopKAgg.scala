package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-by-distance aggregate: keeps the k smallest
  * (dist, id) pairs per group, ascending, ties by id — the partial
  * aggregation form of the kNN merge. Where the window formulation of
  * batch search sorts/shuffles every candidate pair, this buffer is
  * capped at k entries per (group × partition): map-side combine does
  * the per-partition top-k (the reference's per-shard FAISS search,
  * `shard/shard_node.py:127`) and `merge` is the coordinator's k-way
  * merge (`coordinator/coordinator.py:210-249`).
  */
final case class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def ord(e: (Long, Double)): (Double, Long) = (e._2, e._1)

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(b: Seq[(Long, Double)], v: (Long, Double)): Seq[(Long, Double)] =
    if (b.size < k) (b :+ v).sortBy(ord)
    else if (ord(v)._1 < ord(b.last)._1 ||
      (ord(v)._1 == ord(b.last)._1 && ord(v)._2 < ord(b.last)._2))
      (b.init :+ v).sortBy(ord)
    else b

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    (a ++ b).sortBy(ord).take(k)

  override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = r

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}

object TopKAgg {
  /** Column form: `top_k(id, dist, k)` → array<struct<_1:id,_2:dist>>
    * (a tuple-input Aggregator takes one column per tuple field).
    */
  def apply(id: Column, dist: Column, k: Int): Column =
    udaf(TopKAgg(k)).apply(id, dist)

  /** FILTER (WHERE cond) form: the SQL-standard filtered aggregate
    * applied to the custom Aggregator, so one groupBy can take e.g. an
    * unconditional top-k AND a cell-restricted top-k in a SINGLE pass
    * over the scan (e18 does) instead of re-scanning per aggregate.
    * Only the aggregate's input is filtered — the buffer/merge
    * machinery (map-side partial top-k, k-way merge) is unchanged.
    *
    * Goes through a registered SQL function: the Column form of a
    * UDAF is an unresolved invoke node until the analyzer runs, so
    * the FILTER clause can only attach via SQL syntax. Registration
    * is idempotent (same name ⇒ same aggregator).
    *
    * `id`/`dist` are COLUMN NAMES and are backquoted here, so names
    * needing quoting resolve instead of parsing as expressions.
    * `cond` is TRUSTED SQL, interpolated verbatim (it must be able to
    * reference multiple columns) — pass literals/column references
    * only, never untrusted input.
    */
  def filtered(s: org.apache.spark.sql.SparkSession,
               id: String, dist: String, k: Int, cond: String): Column = {
    val fname = s"graft_top_k_$k"
    s.udf.register(fname, udaf(TopKAgg(k)))
    def q(n: String) = "`" + n.replace("`", "``") + "`"
    org.apache.spark.sql.functions.expr(
      s"$fname(${q(id)}, ${q(dist)}) FILTER (WHERE $cond)")
  }
}
