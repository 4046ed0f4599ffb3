package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the text-dedup pipeline. Same contract as the
  * vector kernels: plain integer arithmetic identical to the DuckDB
  * oracle fragments in [[graft.functions.TextFunctions]].
  *
  * Hash definition: fold (acc*31 + codepoint) % P left-to-right over
  * Unicode codepoints (DuckDB `unicode(ch)` semantics); empty string
  * hashes to 0. P = 1e9+7 keeps acc*31+c inside Long.
  */
object TextHash {
  val P: Long = 1000000007L

  def polyHash(s: String, maxChars: Int): Long = {
    var acc = 0L
    var i = 0
    var taken = 0
    while (i < s.length && taken < maxChars) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
      taken += 1
    }
    acc
  }

  /** Static entry point for generated code. */
  def polyHashUtf8(s: UTF8String, maxChars: Int): Long =
    polyHash(s.toString, maxChars)

  /** Static entry point for generated code: count DISTINCT word
    * trigrams ("w1 w2 w3" joined with single spaces, split(-1)
    * semantics) in one pass — the repetition-ratio kernel. An
    * interpreted HOF pipeline for the same computation costs ~2 ms /
    * row once CollapseProject inlines it into several consumers; this
    * is one compiled pass and a hash set.
    */
  def trigramDistinct(s: UTF8String): Long = {
    val words = s.toString.split(" ", -1)
    if (words.length < 3) 0L
    else {
      val set = new java.util.HashSet[String](words.length * 2)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + 2 < words.length) {
        sb.setLength(0)
        sb.append(words(i)).append(' ')
          .append(words(i + 1)).append(' ')
          .append(words(i + 2))
        set.add(sb.toString)
        i += 1
      }
      set.size.toLong
    }
  }

  /** Static entry point for generated code: split + hash in one call. */
  def wordHashesData(s: UTF8String): GenericArrayData = {
    val words = s.toString.split(" ", -1)
    val out = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      out(i) = polyHash(words(i), Int.MaxValue)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Static entry point for generated code: split + hash + word-trigram
    * shingle hashes in ONE pass. shingle_i = (((wh_i*31 + wh_{i+1}) % P)
    * *31 + wh_{i+2}) % P; texts with < 3 words fall back to their word
    * hashes — identical values to the HOF formulation
    * (transform/element_at over a wh column), but O(words) however many
    * consumers CollapseProject inlines it into. The HOF shape
    * re-evaluates the word-hash subexpression inside the interpreted
    * lambda, which made shingle materialization the dominant cost of
    * the whole m5 pipeline (~3 s of a 7.5 s query at sf0.1).
    */
  def shingleHashesData(s: UTF8String): GenericArrayData = {
    val words = s.toString.split(" ", -1)
    val wh = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      wh(i) = polyHash(words(i), Int.MaxValue)
      i += 1
    }
    if (words.length < 3) new GenericArrayData(wh)
    else {
      val out = new Array[Long](words.length - 2)
      var j = 0
      while (j < out.length) {
        out(j) = ((wh(j) * 31 + wh(j + 1)) % P * 31 + wh(j + 2)) % P
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

object TextNorm {
  /** The d7/m6 canonical form in ONE byte-level pass: every char not in
    * [A-Za-z0-9] becomes a space, A-Z lowercase, space runs collapse,
    * leading/trailing spaces drop. Byte-equivalent to the regex chain
    * `trim(regexp_replace(lower(regexp_replace(s, "[^A-Za-z0-9 ]",
    * " ")), " +", " "))` because after the first replace only ASCII
    * survives: each byte of a multi-byte UTF-8 char has the high bit
    * set, so the whole char maps to (collapsed) spaces either way.
    *
    * `maxChars` > 0 caps the OUTPUT length (the m6 60-char prefix key)
    * and early-exits the scan — exact, because a space is only ever
    * emitted in front of a kept alphanumeric, so truncation at n kept
    * chars can't differ from truncating the full form.
    */
  def normalizeAscii(s: UTF8String, maxChars: Int): UTF8String = {
    val bytes = s.getBytes
    val len = bytes.length
    val cap = if (maxChars > 0 && maxChars < len) maxChars else len
    val out = new Array[Byte](cap)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < len && n < cap) {
      val b: Int = bytes(i)
      val lc: Int =
        if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) b
        else if (b >= 'A' && b <= 'Z') b + 32
        else -1
      if (lc >= 0) {
        if (pendingSpace && n > 0) {
          out(n) = ' '
          n += 1
        }
        pendingSpace = false
        if (n < cap) {
          out(n) = lc.toByte
          n += 1
        }
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }
}

/** Canonical text normalization ([[TextNorm.normalizeAscii]]) as a
  * native expression: replaces the two chained regexes that were the
  * last interpreted hot loop in the dedup path (java.util.regex
  * backtracking per row) with a single linear byte scan.
  */
case class TextNormalize(child: Expression, maxChars: Int = -1)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextNorm.normalizeAscii(v.asInstanceOf[UTF8String], maxChars)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextNorm.normalizeAscii($c, $maxChars)")
  override protected def withNewChildInternal(c: Expression): TextNormalize =
    copy(child = c)
  override def prettyName: String = "text_normalize"
}

/** Rolling polynomial hash of the first `maxChars` characters. Codegen
  * stays inside whole-stage spans via a static helper call.
  */
case class TextPolyHash(child: Expression, maxChars: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHash.polyHash(v.asInstanceOf[UTF8String].toString, maxChars)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHash.polyHashUtf8($c, $maxChars)")
  override protected def withNewChildInternal(c: Expression): TextPolyHash =
    copy(child = c)
  override def prettyName: String = "text_poly_hash"
}

/** Split on single spaces (keeping empty tokens, `split(..., -1)` /
  * DuckDB `string_split` semantics) and hash each word — one pass per
  * row instead of a per-word interpreted aggregate.
  */
case class TextWordHashes(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHash.wordHashesData(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHash.wordHashesData($c)")
  override protected def withNewChildInternal(c: Expression): TextWordHashes =
    copy(child = c)
  override def prettyName: String = "text_word_hashes"
}

/** Count of DISTINCT word trigrams — the repetition-ratio kernel
  * (total trigram count is `greatest(n_words - 2, 0)`, no array
  * needed). Codegen'd via a static helper so it stays inside
  * whole-stage spans and costs one pass however many consumers
  * CollapseProject inlines it into.
  */
case class TextTrigramDistinct(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHash.trigramDistinct(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHash.trigramDistinct($c)")
  override protected def withNewChildInternal(c: Expression): TextTrigramDistinct =
    copy(child = c)
  override def prettyName: String = "text_trigram_distinct"
}

/** Word-trigram shingle hashes straight from the text — split, word
  * hash, and shingle fold in one compiled pass (see
  * [[TextHash.shingleHashesData]]). Value-identical to the
  * transform/element_at HOF chain over a [[TextWordHashes]] column,
  * minus the interpreted-lambda re-evaluation tax.
  */
case class TextShingleHashes(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHash.shingleHashesData(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHash.shingleHashesData($c)")
  override protected def withNewChildInternal(c: Expression): TextShingleHashes =
    copy(child = c)
  override def prettyName: String = "text_shingle_hashes"
}

/** Generator (UDTF tier) expression: one output row per word n-gram
  * shingle of the input text — the table-function shape of shingling,
  * complementing the array-building [[TextWordHashes]]. Usable from
  * the Column API (the analyzer plans it through Generate, like
  * explode) and from SQL as `LATERAL VIEW text_shingles(text, 3)`.
  * Null or short (< n words) inputs emit no rows. Splitting follows
  * the engine's word rule: split on single spaces, keep empties.
  */
case class TextShingles(child: Expression, n: Int)
    extends UnaryExpression with Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"text_shingles expects STRING, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val words = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (words.length < n) Nil
      else (0 to words.length - n).map { i =>
        InternalRow(UTF8String.fromString(
          words.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): TextShingles =
    copy(child = c)
}
