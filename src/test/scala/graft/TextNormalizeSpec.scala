package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** The native TextNormalize kernel must be value-identical to the
  * regex chain it replaced — d7/m6 correctness and their DuckDB twins
  * (which still run the regex form in SQL) ride on that equality.
  */
class TextNormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the replaced regex chain, verbatim
  private def regexNorm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(
      lower(regexp_replace(c, "[^A-Za-z0-9 ]", " ")), " +", " "))

  private val edgeTexts = Seq(
    "The QUICK brown-fox; jumps!!",
    "  leading and trailing   ",
    "",
    "   ",
    "---###---",                       // all-symbol -> empty
    "tabs\tand\nnewlines\r\nmixed",
    "unicode café naïve 北京 🚀 done", // multi-byte chars -> spaces
    "digits 123 and CAPS MiXeD 456",
    "a",
    "x  y   z",                        // runs collapse
    "ends with symbol!",
    "!starts with symbol")

  test("native kernel equals the regex chain, incl. edge shapes") {
    edgeTexts.toDF("text")
      .select(TF.normalize(col("text")).as("native"),
        regexNorm(col("text")).as("rx"))
      .collect().foreach { r =>
        assert(r.getString(0) == r.getString(1),
          s"native='${r.getString(0)}' rx='${r.getString(1)}'")
      }
  }

  test("maxChars cap equals substring of the full form") {
    (edgeTexts :+ ("word " * 50).trim).toDF("text")
      .select(TF.normalize(col("text"), 60).as("native"),
        substring(regexNorm(col("text")), 1, 60).as("rx"))
      .collect().foreach { r =>
        assert(r.getString(0) == r.getString(1),
          s"native='${r.getString(0)}' rx='${r.getString(1)}'")
      }
  }

  test("kernel agrees with the regex chain over the documents fixture") {
    val diff = Tables.documents(spark, TestSpark.sf)
      .select(TF.normalize(col("text")).as("native"),
        regexNorm(col("text")).as("rx"))
      .where(not(col("native") === col("rx"))).count()
    assert(diff == 0, s"$diff documents disagree")
  }
}
