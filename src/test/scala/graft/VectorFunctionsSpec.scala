package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("v")).head.getDouble(0)

  val a = Array(1.0f, 2.0f, 3.0f)
  val b = Array(4.0f, 6.0f, 8.0f)

  test("dot") {
    val c = VF.dot(typedLit(a), typedLit(b))
    assert(one(c) === 1 * 4 + 2 * 6 + 3 * 8)
  }

  test("l2sq is squared L2 (FAISS FlatL2 convention)") {
    val c = VF.l2sq(typedLit(a), typedLit(b))
    assert(one(c) === 9.0 + 16.0 + 25.0)
  }

  test("norm and normalize") {
    val v = Array(3.0f, 4.0f)
    assert(one(VF.norm(typedLit(v))) === 5.0)
    val n = Seq(1).toDF("x")
      .select(VF.l2normalize(typedLit(v)).as("n"))
      .head.getSeq[Double](0)
    assert(n == Seq(0.6, 0.8))
  }

  test("zero-vector rule: norm 0 divides by 1.0 (lsh_sharding.py:52)") {
    val z = Array(0.0f, 0.0f, 0.0f)
    val n = Seq(1).toDF("x")
      .select(VF.l2normalize(typedLit(z)).as("n"))
      .head.getSeq[Double](0)
    assert(n == Seq(0.0, 0.0, 0.0))
  }

  test("cosine of identical vectors is 1") {
    assert(math.abs(one(VF.cosine(typedLit(a), typedLit(a))) - 1.0) < 1e-12)
  }

  /** Strict-dimension pin (VERDICT r7 #1): a length mismatch in any
    * binary vector kernel must surface as an error, never fold the
    * common prefix into a plausible wrong distance.
    */
  private def mustMismatch(c: org.apache.spark.sql.Column, label: String): Unit = {
    val e = intercept[Throwable] {
      Seq(1).toDF("x").select(c.as("v")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m => m.contains("differ")), s"$label: $e")
  }

  test("dot/l2sq throw on dimension mismatch (no silent prefix fold)") {
    val short = Array(1.0f, 2.0f)
    mustMismatch(VF.dot(typedLit(a), typedLit(short)), "dot")
    mustMismatch(VF.l2sq(typedLit(a), typedLit(short)), "l2sq")
  }

  test("hamming64/nibble_l2 throw on signature-length mismatch") {
    val s1 = Array(3L, 5L)
    val s2 = Array(3L)
    mustMismatch(VF.hamming64(typedLit(s1), typedLit(s2)), "hamming64")
    mustMismatch(VF.nibbleL2(typedLit(s1), typedLit(s2)), "nibble_l2")
  }

  test("scala mirrors match column expressions") {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    assert(VF.dotS(ad, bd) === one(VF.dot(typedLit(a), typedLit(b))))
    assert(VF.l2sqS(ad, bd) === one(VF.l2sq(typedLit(a), typedLit(b))))
    assert(VF.l2normalizeS(Array(0.0, 0.0)).toSeq == Seq(0.0, 0.0))
  }
}
