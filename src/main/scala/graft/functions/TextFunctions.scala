package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline kernel: portable hashing and tokenization used by the
  * dedup / fingerprint operators.
  *
  * Hashes are defined as plain integer arithmetic over character
  * codepoints so the DuckDB oracle can evaluate the *same* function —
  * engine-native hash() builtins differ across engines and would make
  * results unverifiable. All arithmetic stays within Long range:
  * acc < P ≈ 1e9, acc*31 + c < 2^63.
  */
object TextFunctions {
  val P: Long = 1000000007L

  /** Whitespace tokenization: split on single spaces, trailing empties
    * kept (Java split limit -1 == DuckDB string_split semantics).
    */
  def words(text: Column): Column = split(text, " ")

  /** Rolling polynomial hash of a string: fold (acc*31 + codepoint) % P
    * left-to-right. Empty string → 0 (guard needed because Spark's
    * sequence(1,0) counts *down* instead of producing an empty array).
    */
  def charPolyHash(s: Column): Column =
    when(length(s) === 0, lit(0L)).otherwise(
      aggregate(sequence(lit(1), length(s)), lit(0L),
        (acc, i) => (acc * 31 + ascii(s.substr(i, lit(1)))) % P))

  /** Per-word hashes for a text column. */
  def wordHashes(text: Column): Column =
    transform(words(text), w => charPolyHash(w))

  /** DuckDB twin of [[charPolyHash]]. `expr` is a VARCHAR expression;
    * may reference lambda variables of an enclosing list_transform.
    */
  def charPolyHashSql(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($expr)+1), " +
      s"cpi -> CAST(unicode(($expr)[cpi]) AS BIGINT))), " +
      s"(cpa, cpc) -> (cpa*31 + cpc) % $P)"

  def wordHashesSql(textExpr: String): String =
    s"list_transform(string_split($textExpr, ' '), w -> ${charPolyHashSql("w")})"
}
