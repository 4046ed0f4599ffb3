package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.TextHash
import graft.functions.{TextFunctions => TF}

class ExtendedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("text poly hash: empty string is 0, fold matches definition") {
    assert(TextHash.polyHash("", 100) == 0L)
    // "ab" -> ((0*31 + 97) % P)*31 + 98 % P
    assert(TextHash.polyHash("ab", 100) == 97L * 31 + 98)
    // truncation
    assert(TextHash.polyHash("abcdef", 2) == TextHash.polyHash("ab", 100))
  }

  test("word hashes keep empty tokens (split -1 semantics)") {
    import spark.implicits._
    val r = Seq("a  b", "", "x").toDF("text")
      .select(TF.wordHashes(col("text")).as("wh"))
      .collect().map(_.getSeq[Long](0))
    assert(r(0).length == 3 && r(0)(1) == 0L)
    assert(r(1) == Seq(0L))
    assert(r(2) == Seq(TextHash.polyHash("x", Int.MaxValue)))
  }

  test("p1_pca: 8 components, deterministic across fits") {
    val a = run("p1_pca").collect()
    assert(a.length == 500)
    assert(a.forall(_.getSeq[Double](1).length == 8))
    val b = run("p1_pca").collect()
    assert(a.map(_.getSeq[Double](1)).toSeq == b.map(_.getSeq[Double](1)).toSeq)
  }

  test("p1_pca captures variance: projected norms nonzero") {
    val rows = run("p1_pca").collect()
    val meanNorm = rows.map(r =>
      math.sqrt(r.getSeq[Double](1).map(x => x * x).sum)).sum / rows.length
    assert(meanNorm > 0.1, s"mean projected norm $meanNorm")
  }

  test("r16_pivot row sums equal group counts") {
    val p = run("r16_pivot").collect()
    val total = p.map(r =>
      (1 to 3).map(i => if (r.isNullAt(i)) 0L else r.getLong(i)).sum).sum
    assert(total == Tables.orders(spark, sf).count())
  }

  test("r17 sessions: counts sum to events, bounds ordered") {
    val rows = run("r17_sessionize").collect()
    assert(rows.map(_.getLong(2)).sum == Tables.events(spark, sf).count())
    assert(rows.forall(r => r.getLong(3) <= r.getLong(4)))
  }

  test("s2 sliding: every tumbling event appears in 4 sliding windows") {
    val n_slide = run("s2_stream_sliding").agg(sum("n")).head.getLong(0)
    val ev = Tables.events(spark, sf)
      .select(expr("ts div 1000").as("us"))
    val mx = ev.agg(max("us")).head.getLong(0)
    // events whose all-4 windows close below the watermark contribute 4;
    // near-tail events contribute fewer — so 4×(events fully inside).
    val full = ev.where(
      (expr("us div 1800000000") + 1) * 1800000000L + 5400000000L <= mx - 600000000L)
      .count()
    assert(n_slide >= full * 4, s"slide=$n_slide full4=${full * 4}")
  }
}
