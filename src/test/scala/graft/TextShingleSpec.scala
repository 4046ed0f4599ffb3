package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** The native TextShingleHashes kernel must be value-identical to the
  * HOF formulation it replaced (transform/element_at over a wordHashes
  * column) — m1/m3/m5/m7 correctness and their DuckDB twins all ride
  * on that equality.
  */
class TextShingleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import TF.P

  // the replaced HOF chain, verbatim
  private def hofShingles(wh: org.apache.spark.sql.Column) =
    when(size(wh) >= 3,
      transform(sequence(lit(1), size(wh) - 2), i =>
        (((element_at(wh, i) * 31 + element_at(wh, i + 1)) % P) * 31 +
          element_at(wh, i + 2)) % P))
      .otherwise(wh)

  test("native kernel equals the HOF formulation, incl. edge shapes") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c",            // exactly 3 words -> 1 shingle
      "one two",          // < 3 words -> word-hash fallback
      "solo",
      "",                 // empty -> [hash("")] = [0]
      "x  y z",           // double space keeps the empty token
      "dup dup dup dup")  // repeated words -> repeated shingles kept
    val df = texts.toDF("text")
      .withColumn("wh", TF.wordHashes(col("text")))
      .select(
        TF.shingleHashes(col("text")).as("native"),
        hofShingles(col("wh")).as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"native=${r.getSeq[Long](0)} hof=${r.getSeq[Long](1)}")
    }
  }

  test("kernel agrees with the HOF chain over the documents fixture") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .withColumn("wh", TF.wordHashes(col("text")))
      .select(
        TF.shingleHashes(col("text")).as("native"),
        hofShingles(col("wh")).as("hof"))
    val diff = docs
      .where(not(col("native") === col("hof"))).count()
    assert(diff == 0, s"$diff documents disagree")
  }
}
