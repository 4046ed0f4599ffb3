package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom vector aggregate: element-wise mean of an embedding column
  * (the real centroid computation an IVF index build needs — the
  * reference has no aggregation extension surface at all, SURVEY §2.8).
  *
  * Buffer = (per-dim double sums, count); merge is element-wise sum —
  * associative and commutative, so partial aggregation (map-side
  * combine) applies and the shuffle carries one buffer per group per
  * partition, not the vectors.
  */
object VecMean extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val sums = if (b._1.length == 0) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.length == 0) b
    else if (b._1.length == 0) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()

  /** Column form: `vec_mean(embedding)` → array<double>. */
  def apply(c: Column): Column = udaf(this).apply(c)
}
