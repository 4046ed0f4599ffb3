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

  import org.apache.spark.sql.graft.ColumnBridge

  /** Rolling polynomial hash of the first `maxChars` characters: fold
    * (acc*31 + codepoint) % P left-to-right; empty → 0. Native
    * expression (one pass per row).
    */
  def polyHash(s: Column, maxChars: Int = Int.MaxValue): Column =
    ColumnBridge.column(graft.expressions.TextPolyHash(
      ColumnBridge.expression(s), maxChars))

  /** Canonical dedup normalization (d7 form): non-alphanumerics →
    * space, lowercase, collapse runs, trim — one native byte scan.
    * `maxChars` > 0 additionally caps the output length (prefix-key
    * form) with an exact early exit.
    */
  def normalize(text: Column, maxChars: Int = -1): Column =
    ColumnBridge.column(graft.expressions.TextNormalize(
      ColumnBridge.expression(text), maxChars))

  /** Per-word hashes for a text column (split on single spaces, empty
    * tokens kept and hashed to 0).
    */
  def wordHashes(text: Column): Column =
    ColumnBridge.column(graft.expressions.TextWordHashes(
      ColumnBridge.expression(text)))

  /** Count of DISTINCT word trigrams (joined with single spaces) —
    * native one-pass kernel for the repetition-ratio signal.
    */
  def trigramDistinct(text: Column): Column =
    ColumnBridge.column(graft.expressions.TextTrigramDistinct(
      ColumnBridge.expression(text)))

  /** Word-trigram shingle hashes straight from the text (< 3 words
    * falls back to the word hashes) — one compiled pass; value-equal
    * to transform/element_at over [[wordHashes]] but immune to the
    * interpreted-lambda re-evaluation that shape pays after
    * CollapseProject inlines the wh column.
    */
  def shingleHashes(text: Column): Column =
    ColumnBridge.column(graft.expressions.TextShingleHashes(
      ColumnBridge.expression(text)))

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
