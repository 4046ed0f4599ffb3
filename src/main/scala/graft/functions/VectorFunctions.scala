package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression vector kernel over `ArrayType(FloatType)` embeddings.
  *
  * All arithmetic is carried out in Double (element-wise cast before any
  * op) with a fixed left-to-right fold, so results are deterministic and
  * bit-identical to the DuckDB oracle, which performs the same casts in
  * the same order (see [[DuckSql]]).
  *
  * Semantics mirror the reference vector store:
  *  - distance is **squared** L2, the FAISS `IndexFlatL2` convention
  *    (reference `shard/shard_node.py:127`);
  *  - L2 normalization maps a zero vector to itself — the reference
  *    replaces a zero norm with 1.0 (`sharding/lsh_sharding.py:52`).
  *
  * Built on Spark higher-order functions (`zip_with`/`aggregate`/
  * `transform`), i.e. pure Catalyst expressions: no UDF serialization,
  * fully distributed, and safe under whole-stage codegen fallback.
  */
object VectorFunctions {

  import graft.expressions.{VecDot, VecHamming64, VecL2Normalize, VecL2Sq, VecNibbleL2, VecNibblePack, VecNorm, VecSignPack}
  import org.apache.spark.sql.graft.ColumnBridge

  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def ex(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(c)

  /** Dot product of two float-array columns, accumulated in Double. */
  def dot(a: Column, b: Column): Column = toCol(VecDot(ex(a), ex(b)))

  /** Squared L2 distance (FAISS FlatL2 convention) between two arrays. */
  def l2sq(a: Column, b: Column): Column = toCol(VecL2Sq(ex(a), ex(b)))

  /** L2 norm. */
  def norm(a: Column): Column = toCol(VecNorm(ex(a), safe = false))

  /** Norm with the reference's zero-vector rule: norm 0 → divisor 1.0. */
  def safeNorm(a: Column): Column = toCol(VecNorm(ex(a), safe = true))

  /** L2-normalize to array<double> (zero vector maps to itself). */
  def l2normalize(a: Column): Column = toCol(VecL2Normalize(ex(a)))

  /** Cosine similarity; zero-norm vectors get similarity 0 via the
    * safe-norm rule (divisor 1.0 keeps the numerator 0).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (safeNorm(a) * safeNorm(b))

  /** Seeded ±1 JL projection to `outDims` dims (compiled kernel). */
  def jlProject(a: Column, outDims: Int): Column =
    toCol(graft.expressions.VecJlProject(ex(a), outDims))

  /** 1-bit sign quantization: pack (xᵢ > 0) bits into array<long>. */
  def signPack(a: Column): Column = toCol(VecSignPack(ex(a)))

  /** Hamming distance between two packed sign signatures. */
  def hamming64(a: Column, b: Column): Column =
    toCol(VecHamming64(ex(a), ex(b)))

  /** INT4 nibble-pack of SQ8 codes (array<int> → array<long>). */
  def nibblePack(codes: Column): Column = toCol(VecNibblePack(ex(codes)))

  /** Integer squared-L2 between two nibble-packed INT4 code arrays. */
  def nibbleL2(a: Column, b: Column): Column =
    toCol(VecNibbleL2(ex(a), ex(b)))

  /** Dot product against a constant query vector. */
  def dotLit(a: Column, q: Array[Double]): Column =
    dot(a, typedLit(q))

  /** Squared L2 distance against a constant query vector. */
  def l2sqLit(a: Column, q: Array[Double]): Column =
    l2sq(a, typedLit(q))

  // ---------------------------------------------------------------- scala
  // Driver-side mirrors (for query-vector prep), same fold order.

  def dotS(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  def l2sqS(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  def normS(a: Array[Double]): Double = math.sqrt(dotS(a, a))

  /** Driver-side mirror of [[nibblePack]] (query INT4 code prep):
    * pack the top nibbles of SQ8 codes, 16 per long.
    */
  def nibblePackS(codes: Array[Long]): Array[Long] = {
    val out = new Array[Long]((codes.length + 15) >>> 4)
    var i = 0
    while (i < codes.length) {
      val nib = (codes(i) >>> 4) & 0xFL
      out(i >>> 4) |= nib << ((i & 15) << 2)
      i += 1
    }
    out
  }

  /** Driver-side mirror of [[signPack]] (query-signature prep). */
  def signPackS(a: Array[Double]): Array[Long] = {
    val out = new Array[Long]((a.length + 63) >>> 6)
    var i = 0
    while (i < a.length) {
      if (a(i) > 0.0) out(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    out
  }

  def l2normalizeS(a: Array[Double]): Array[Double] = {
    val n = normS(a)
    val div = if (n == 0.0) 1.0 else n
    a.map(_ / div)
  }
}

/** DuckDB-dialect SQL fragments mirroring [[VectorFunctions]], used to
  * assemble the oracle SQL strings. Kept next to the Spark forms so the
  * two dialects evolve in lockstep.
  */
object DuckSql {
  /** Squared L2 distance between two list expressions. */
  def l2sq(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> " +
      s"(CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE)) * " +
      s"(CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE))))"

  /** Dot product of two list expressions. */
  def dot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> " +
      s"CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)))"

  /** L2 norm of a list expression. */
  def norm(a: String): String = s"sqrt(${dot(a, a)})"

  /** Zero-safe norm (reference rule: norm 0 → 1.0). */
  def safeNorm(a: String): String = {
    val n = norm(a)
    s"(CASE WHEN $n = 0 THEN 1.0 ELSE $n END)"
  }

  /** Cosine similarity of two list expressions. */
  def cosine(a: String, b: String): String =
    s"(${dot(a, b)} / (${safeNorm(a)} * ${safeNorm(b)}))"
}
