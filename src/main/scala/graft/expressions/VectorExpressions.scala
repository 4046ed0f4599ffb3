package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the vector hot path.
  *
  * The HOF forms (`aggregate(zip_with(...))`) are semantically right but
  * evaluate an interpreted expression tree per *element* — at sf0.1 the
  * kNN/near-dup queries spent >80% of wall-clock there. These
  * expressions evaluate one tight loop per *row* and participate in
  * whole-stage codegen (`doGenCode` emits the Java loop), which is the
  * posture that survives a 100-TB scan.
  *
  * Numeric contract (must stay bit-identical to the DuckDB oracle and
  * to the HOF forms they replace): elements are widened to double, the
  * accumulator is a double, iteration is ascending index — the same
  * left-to-right fold as `aggregate(...)` / DuckDB `list_sum(...)`.
  *
  * Inputs are `ArrayType(FloatType|DoubleType)` with non-null elements
  * (the embeddings schema). Binary folds require equal lengths: a
  * dimension mismatch is a schema/layout bug, and folding the common
  * prefix would return a plausible-but-wrong distance, so they throw
  * (same strict rule as [[VecHamming64]]/[[VecNibbleL2]]).
  */
trait VecExprHelpers { self: Expression =>
  protected def elemPrim(dt: DataType): String = dt match {
    case ArrayType(FloatType, _)  => "Float"
    case ArrayType(DoubleType, _) => "Double"
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }
  protected def getter(dt: DataType, arr: String, i: String): String =
    s"((double) $arr.get${elemPrim(dt)}($i))"
  protected def isFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType
  @inline protected final def elem(a: ArrayData, i: Int, float: Boolean): Double =
    if (float) a.getFloat(i).toDouble else a.getDouble(i)
}

abstract class VecBinaryFold extends BinaryExpression with VecExprHelpers {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Java source for one loop step: updates `acc` from `x` and `y`. */
  protected def stepJava(acc: String, x: String, y: String): String
  protected def stepEval(acc: Double, x: Double, y: Double): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    val n = a.numElements()
    if (n != b.numElements())
      VecEval.foldLenMismatch(prettyName, n, b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = stepEval(acc, elem(a, i, lf), elem(b, i, rf))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  graft.expressions.VecEval.foldLenMismatch("$prettyName", $n, $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(left.dataType, a, i)};
         |  double $y = ${getter(right.dataType, b, i)};
         |  ${stepJava(acc, x, y)}
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Dot product: Σ aᵢ·bᵢ. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryFold {
  override protected def stepJava(acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"
  override protected def stepEval(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** Squared L2 distance (FAISS FlatL2 convention): Σ (aᵢ−bᵢ)². */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryFold {
  override protected def stepJava(acc: String, x: String, y: String): String =
    s"double d = $x - $y; $acc += d * d;"
  override protected def stepEval(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_l2sq"
}

/** L2 norm; with `safe` the reference's zero-norm rule (0 → 1.0,
  * `lsh_sharding.py:52`) is applied, making it a direct divisor.
  */
case class VecNorm(child: Expression, safe: Boolean)
    extends UnaryExpression with VecExprHelpers {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val f = isFloat(child.dataType)
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = elem(a, i, f); acc += x * x; i += 1 }
    val nrm = math.sqrt(acc)
    if (safe && nrm == 0.0) 1.0 else nrm
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val nrm = ctx.freshName("nrm")
      val fix = if (safe) s"if ($nrm == 0.0) $nrm = 1.0;" else ""
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(child.dataType, a, i)};
         |  $acc += $x * $x;
         |}
         |double $nrm = java.lang.Math.sqrt($acc);
         |$fix
         |${ev.value} = $nrm;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecNorm = copy(child = c)
  override def prettyName: String = if (safe) "vec_safe_norm" else "vec_norm"
}

/** Static loop bodies shared by interpreted eval and generated code. */
object VecEval {
  /** Shared failure path for the binary vector folds (interpreted +
    * codegen): a dimension mismatch is a schema bug, never a distance.
    */
  def foldLenMismatch(name: String, a: Int, b: Int): Nothing =
    throw new IllegalArgumentException(
      s"$name: vector dimensions differ ($a vs $b); " +
        "both sides of a distance/dot must share one embedding layout")

  /** Shared failure path for [[VecHamming64]] (interpreted + codegen):
    * a signature-length mismatch is a layout bug, never a distance.
    */
  def hammingLenMismatch(a: Int, b: Int): Nothing =
    throw new IllegalArgumentException(
      s"vec_hamming64: signature lengths differ ($a vs $b words); " +
        "stored and query sign-pack layouts must use the same dimension")

  def l2normalize(a: ArrayData, isFloat: Boolean): GenericArrayData = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x; i += 1
    }
    val nrm0 = math.sqrt(acc)
    val nrm = if (nrm0 == 0.0) 1.0 else nrm0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x / nrm; i += 1
    }
    new GenericArrayData(out)
  }

  /** Pack sign bits (elemᵢ > 0) into longs, 64 per word, bit i of word
    * i/64 — the 1-bit binary-quantization signature (32× smaller than
    * float32 for 128-dim).
    */
  def signPack(a: ArrayData, isFloat: Boolean): GenericArrayData = {
    val n = a.numElements()
    val out = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      if (x > 0.0) out(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Seeded ±1 Johnson-Lindenstrauss projection to `outDims`
    * dimensions (e23): out(j) = Σᵢ xᵢ · sign(i, j), sign = bit 10 of
    * the Knuth multiplicative hash of the cell index i·outDims+j+1 —
    * the SAME arithmetic, fold order (j outer, i ascending) and 0.0
    * init as the HOF column form and the DuckDB twin, so swapping the
    * interpreted lambda for this kernel is plan-invisible: identical
    * doubles, ~zero per-element allocation.
    */
  def jlProject(a: ArrayData, isFloat: Boolean, outDims: Int): GenericArrayData = {
    val n = a.numElements()
    val out = new Array[Double](outDims)
    var j = 0
    while (j < outDims) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val key = (i.toLong * outDims + j + 1) * 2654435761L
        val s = if ((key % 1048576L) / 1024L % 2L == 0L) 1.0 else -1.0
        acc += x * s
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Truncate SQ8 codes (0–255 ints) to their top nibble and pack 16
    * per long — the INT4 storage layout ([[VecNibblePack]]).
    */
  def nibblePack(a: ArrayData): GenericArrayData = {
    val n = a.numElements()
    val out = new Array[Long]((n + 15) >>> 4)
    var i = 0
    while (i < n) {
      val nib = (a.getInt(i) >>> 4) & 0xF
      out(i >>> 4) |= nib.toLong << ((i & 15) << 2)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SQ8 encode: round((xᵢ − minᵢ) · scaleᵢ) per dimension, with
    * Spark's `round(_, 0)` HALF_UP BigDecimal semantics replicated
    * exactly (Math.round differs on ties-adjacent doubles), so the
    * kernel is bit-identical to the HOF `transform(round(...))` form
    * and the DuckDB twin.
    */
  def sq8Encode(a: ArrayData, mins: Array[Double], scales: Array[Double],
      isFloat: Boolean): GenericArrayData = {
    val n = a.numElements()
    if (n != mins.length) foldLenMismatch("vec_sq8_encode", n, mins.length)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val v = (x - mins(i)) * scales(i)
      out(i) = java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 0-based argmin-L2 over the coarse centroids (IVF cell): ties to
    * the LOWEST index — the `array_position(dists, array_min(dists))`
    * first-match rule of the HOF form. Distance folds are ascending
    * from 0.0, identical to [[VecL2Sq]] / the DuckDB list_reduce twin.
    */
  def ivfCell(a: ArrayData, centroids: Array[Array[Double]],
      isFloat: Boolean): Int = {
    val n = a.numElements()
    var best = 0
    var bd = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (n != cent.length) foldLenMismatch("vec_ivf_cell", n, cent.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val d = x - cent(i)
        acc += d * d
        i += 1
      }
      if (acc < bd) { bd = acc; best = c }
      c += 1
    }
    best
  }

  /** y = M·x with ascending-i inner sums (rows of M are the output
    * dims) — the OPQ rotation kernel. Bit-identical to the DuckDB
    * `list_sum(list_transform(range, i -> m[r][i] * x[i]))` twin.
    */
  def matVec(a: ArrayData, m: Array[Array[Double]],
      isFloat: Boolean): GenericArrayData = {
    val n = a.numElements()
    if (m.length == 0 || m(0).length != n)
      foldLenMismatch("vec_mat_vec", n, if (m.length == 0) 0 else m(0).length)
    val out = new Array[Double](m.length)
    var r = 0
    while (r < m.length) {
      val row = m(r)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        acc += row(i) * x
        i += 1
      }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  /** PQ encode: per subspace j, the 1-BASED index of the nearest
    * codebook centroid over dims [j·sub, (j+1)·sub) — first-match tie
    * rule and ascending-dim distance folds, bit-identical to the HOF
    * `array_position(transform(books, sqd(slice(e,...), _)), min)`
    * chain. `residualOf` (nullable) subtracts the row's coarse
    * centroid first — the IVFPQ residual path — with the subtraction
    * widened to double exactly like the `zip_with(x - c)` form.
    */
  def pqEncode(a: ArrayData, books: Array[Array[Array[Double]]],
      subDim: Int, residualOf: Array[Double],
      isFloat: Boolean): GenericArrayData = {
    val n = a.numElements()
    val m = books.length
    if (n != m * subDim) foldLenMismatch("vec_pq_encode", n, m * subDim)
    if (residualOf != null && residualOf.length != n)
      foldLenMismatch("vec_pq_encode.residual", n, residualOf.length)
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      val base = j * subDim
      var best = 0
      var bd = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          var x = if (isFloat) a.getFloat(base + i).toDouble
                  else a.getDouble(base + i)
          if (residualOf != null) x -= residualOf(base + i)
          val d = x - cent(i)
          acc += d * d
          i += 1
        }
        if (acc < bd) { bd = acc; best = c }
        c += 1
      }
      out(j) = best + 1 // 1-based: ADC LUTs are element_at-addressed
      j += 1
    }
    new GenericArrayData(out)
  }

  def lshBucket(a: ArrayData, matrix: Array[Array[Double]],
      numBuckets: Int, isFloat: Boolean): Int = {
    val n = a.numElements()
    var sum = 0L
    var j = 0
    while (j < matrix.length) {
      val row = matrix(j)
      val m = math.min(n, row.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        acc += x * row(i); i += 1
      }
      if (acc > 0.0) sum += 1L << j
      j += 1
    }
    // floorMod, not %: with >=64 projection bits (16 tables x 4 fns)
    // bit 63 is 1L<<63 = Long.MIN_VALUE, sum goes negative, and Java %
    // keeps the dividend's sign — buckets would land in
    // (-numBuckets, numBuckets), silently doubling the partition count.
    java.lang.Math.floorMod(sum, numBuckets.toLong).toInt
  }
}

/** L2-normalize to array<double> with the zero-norm rule: two passes,
  * norm then divide — the same op sequence as the oracle SQL. Codegen
  * delegates to the static loop so whole-stage spans stay unbroken.
  */
case class VecL2Normalize(child: Expression)
    extends UnaryExpression with VecExprHelpers {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecEval.l2normalize(v.asInstanceOf[ArrayData], isFloat(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.VecEval.l2normalize($a, ${isFloat(child.dataType)})")

  override protected def withNewChildInternal(c: Expression): VecL2Normalize =
    copy(child = c)
  override def prettyName: String = "vec_l2normalize"
}

/** Seeded ±1 JL projection to `outDims` dims ([[VecEval.jlProject]]):
  * the e23 coarse-pass transform as a compiled kernel instead of a
  * transform/aggregate lambda chain — same doubles, no per-element
  * interpretation or allocation.
  */
case class VecJlProject(child: Expression, outDims: Int)
    extends UnaryExpression with VecExprHelpers {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecEval.jlProject(v.asInstanceOf[ArrayData], isFloat(child.dataType), outDims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.VecEval.jlProject($a, ${isFloat(child.dataType)}, $outDims)")

  override protected def withNewChildInternal(c: Expression): VecJlProject =
    copy(child = c)
  override def prettyName: String = "vec_jl_project"
}

/** 1-bit binary quantization: pack the per-dimension sign bits
  * (xᵢ > 0) into `array<long>` (64 dims per word). The signature is
  * 32× smaller than the float32 vector, so the Hamming candidate scan
  * reads 1/32 of the bytes — the standard BQ tier (e.g. FAISS
  * `IndexBinaryFlat` over sign quantization).
  */
case class VecSignPack(child: Expression)
    extends UnaryExpression with VecExprHelpers {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecEval.signPack(v.asInstanceOf[ArrayData], isFloat(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.VecEval.signPack($a, ${isFloat(child.dataType)})")

  override protected def withNewChildInternal(c: Expression): VecSignPack =
    copy(child = c)
  override def prettyName: String = "vec_sign_pack"
}

/** Hamming distance between two packed sign signatures
  * (`array<long>`, [[VecSignPack]] layout): Σ popcount(aᵢ xor bᵢ).
  * One `Long.bitCount` per 64 dims. The signatures must be the same
  * length — a mismatch means the stored and query layouts disagree
  * (different dim or packing), and truncating would return a
  * plausible small distance instead of surfacing the bug, so it
  * throws.
  */
case class VecHamming64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) VecEval.hammingLenMismatch(n, b.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  graft.expressions.VecEval.hammingLenMismatch($n, $b.numElements());
         |}
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecHamming64 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_hamming64"
}

/** Sign-random-projection LSH bucket: bit_j = (row_j · v > 0), bucket =
  * (Σ bit_j·2^j) mod numBuckets. One fused pass over all projection
  * rows; runs once per row at index-build/group time.
  */
case class VecLshBucket(child: Expression, matrix: Array[Array[Double]],
    numBuckets: Int)
    extends UnaryExpression with VecExprHelpers {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecEval.lshBucket(v.asInstanceOf[ArrayData], matrix, numBuckets,
      isFloat(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("lshMatrix", matrix, "double[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.VecEval.lshBucket($a, $m, $numBuckets, ${isFloat(child.dataType)})")
  }

  override protected def withNewChildInternal(c: Expression): VecLshBucket =
    copy(child = c)
  override def prettyName: String = "vec_lsh_bucket"
}

/** SQ8 scalar-quantization encode ([[VecEval.sq8Encode]]): the
  * per-dimension `round((x - min) * scale)` transform as one compiled
  * loop — the quant-index build's hottest per-row op, previously an
  * interpreted `transform` with two `element_at` lookups per element.
  */
case class VecSq8Encode(child: Expression, mins: Array[Double],
    scales: Array[Double])
    extends UnaryExpression with VecExprHelpers {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecEval.sq8Encode(v.asInstanceOf[ArrayData], mins, scales,
      isFloat(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("sq8Mins", mins, "double[]")
    val sc = ctx.addReferenceObj("sq8Scales", scales, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.VecEval.sq8Encode($a, $mn, $sc, ${isFloat(child.dataType)})")
  }

  override protected def withNewChildInternal(c: Expression): VecSq8Encode =
    copy(child = c)
  override def prettyName: String = "vec_sq8_encode"
}

/** IVF coarse-cell assignment ([[VecEval.ivfCell]]): 0-based argmin-L2
  * over the trained centroids in one fused loop (first-match ties).
  */
case class VecIvfCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with VecExprHelpers {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecEval.ivfCell(v.asInstanceOf[ArrayData], centroids,
      isFloat(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.VecEval.ivfCell($a, $c, ${isFloat(child.dataType)})")
  }

  override protected def withNewChildInternal(c: Expression): VecIvfCell =
    copy(child = c)
  override def prettyName: String = "vec_ivf_cell"
}

/** Dense matrix-vector product y = M·x ([[VecEval.matVec]]) — the OPQ
  * rotation applied row-wise at encode time (Ge et al., "Optimized
  * Product Quantization", CVPR 2013; FAISS `OPQMatrix`). Ascending-i
  * inner sums, so a DuckDB `list_sum(list_transform(...))` twin over
  * the same injected matrix literals is bit-identical.
  */
case class VecMatVec(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression with VecExprHelpers {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecEval.matVec(v.asInstanceOf[ArrayData], matrix, isFloat(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matVecM", matrix, "double[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.VecEval.matVec($a, $m, ${isFloat(child.dataType)})")
  }

  override protected def withNewChildInternal(c: Expression): VecMatVec =
    copy(child = c)
  override def prettyName: String = "vec_mat_vec"
}

/** Product-quantization encode ([[VecEval.pqEncode]]): all subspace
  * argmins in one fused loop over the row — replaces a per-subspace
  * `slice`/`zip_with`/`aggregate` HOF chain that interpreted (and
  * allocated) per ELEMENT.
  */
case class VecPqEncode(child: Expression,
    books: Array[Array[Array[Double]]], subDim: Int)
    extends UnaryExpression with VecExprHelpers {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecEval.pqEncode(v.asInstanceOf[ArrayData], books, subDim, null,
      isFloat(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bk = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.VecEval.pqEncode($a, $bk, $subDim, null, " +
        s"${isFloat(child.dataType)})")
  }

  override protected def withNewChildInternal(c: Expression): VecPqEncode =
    copy(child = c)
  override def prettyName: String = "vec_pq_encode"
}

/** RESIDUAL product-quantization encode (the FAISS IVFPQ path): like
  * [[VecPqEncode]] but the row's coarse centroid (selected by the
  * `cell` child, a 0-based [[VecIvfCell]] assignment) is subtracted
  * inside the distance loop — same doubles as the
  * `zip_with(x − c)` + HOF-codes chain it replaces, zero intermediate
  * arrays.
  */
case class VecPqrEncode(left: Expression, right: Expression,
    books: Array[Array[Array[Double]]], subDim: Int,
    ivfCentroids: Array[Array[Double]])
    extends BinaryExpression with VecExprHelpers {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any, c: Any): Any =
    VecEval.pqEncode(v.asInstanceOf[ArrayData], books, subDim,
      ivfCentroids(c.asInstanceOf[Int]), isFloat(left.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bk = ctx.addReferenceObj("pqrBooks", books, "double[][][]")
    val cents = ctx.addReferenceObj("ivfCents", ivfCentroids, "double[][]")
    defineCodeGen(ctx, ev, (a, c) =>
      s"graft.expressions.VecEval.pqEncode($a, $bk, $subDim, " +
        s"$cents[$c], ${isFloat(left.dataType)})")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecPqrEncode =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_pqr_encode"
}

/** Nibble-pack INT4 codes: input `array<int>` of SQ8 codes 0–255, each
  * truncated to its top 4 bits (code >>> 4 — the standard int4
  * truncation of an int8 scalar quantizer), 16 nibbles per output
  * long. 4 bits/dim = 8× smaller than float32 at rest — double SQ8's
  * coarse-scan byte advantage; two-stage search re-ranks exactly, so
  * only the candidate cut coarsens.
  */
case class VecNibblePack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VecEval.nibblePack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.VecEval.nibblePack($a)")

  override protected def withNewChildInternal(c: Expression): VecNibblePack =
    copy(child = c)
  override def prettyName: String = "vec_nibble_pack"
}

/** Integer squared-L2 between two nibble-packed INT4 code arrays
  * ([[VecNibblePack]] layout): Σ (aᵢ − bᵢ)² over 4-bit codes, unpacked
  * 16 per long with shift/mask — no branching, whole-stage codegen.
  * Same strict length rule as [[VecHamming64]]: a layout mismatch
  * throws instead of returning a plausible distance. Trailing nibbles
  * beyond the dimension are zero on both sides and contribute nothing.
  */
case class VecNibbleL2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) VecEval.hammingLenMismatch(n, b.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      val x = a.getLong(i); val y = b.getLong(i)
      var s = 0
      while (s < 64) {
        val d = ((x >>> s) & 0xFL).toInt - ((y >>> s) & 0xFL).toInt
        acc += d * d
        s += 4
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  graft.expressions.VecEval.hammingLenMismatch($n, $b.numElements());
         |}
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($i);
         |  for (int $s = 0; $s < 64; $s += 4) {
         |    int $d = (int) (($x >>> $s) & 0xFL) - (int) (($y >>> $s) & 0xFL);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecNibbleL2 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_nibble_l2"
}
