package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.{QuantConfig, QuantModel}

/** The round-15 optimization parallelized the quant trainer's driver
  * math (concurrent tier chains, parallel per-slot loops) and fused
  * the SQ8 stats pass with the corpus count. Those are WALL-CLOCK
  * changes only: this spec pins the trained model BIT-IDENTICAL to the
  * original sequential reference (copied verbatim below, as shipped
  * through round 20 / commit 0e1ecca) — the same discipline the encode
  * kernels use (their interpreted-HOF twins are spec-pinned in
  * Round8Spec).
  */
class QuantTrainEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // ---------------------------------------------------------------
  // Sequential reference implementations (pre-r15, verbatim).
  // ---------------------------------------------------------------

  private def fitSubRef(pts: Array[Array[Double]], k: Int,
                        seed: Long): Array[Array[Double]] = {
    require(pts.nonEmpty, "PQ training sample is empty")
    val rnd = new scala.util.Random(seed)
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val centers = scala.collection.mutable.ArrayBuffer(
      pts(rnd.nextInt(pts.length)).clone())
    while (centers.size < k) {
      val d2 = pts.map(p => centers.map(c => sq(p, c)).min)
      val tot = d2.sum
      if (tot <= 0) centers += pts(rnd.nextInt(pts.length)).clone()
      else {
        var r = rnd.nextDouble() * tot; var i = 0
        while (i < pts.length - 1 && r > d2(i)) { r -= d2(i); i += 1 }
        centers += pts(i).clone()
      }
    }
    for (_ <- 0 until 10) {
      val sums = Array.fill(k)(new Array[Double](pts(0).length))
      val counts = new Array[Long](k)
      pts.foreach { p =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < k) {
          val dd = sq(p, centers(c))
          if (dd < bd) { bd = dd; best = c }; c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
      }
      (0 until k).foreach { c =>
        if (counts(c) > 0) centers(c) = sums(c).map(_ / counts(c))
      }
    }
    centers.toArray
  }

  private def trainOpqRef(sample: Array[Array[Double]],
      cfg: QuantConfig, dim: Int)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val sub = dim / cfg.pqSubspaces
    def matVec(m: Array[Array[Double]], x: Array[Double]): Array[Double] =
      Array.tabulate(dim) { r =>
        var acc = 0.0; var i = 0
        while (i < dim) { acc += m(r)(i) * x(i); i += 1 }
        acc
      }
    def reconstruct(books: Array[Array[Array[Double]]],
        xr: Array[Double]): Array[Double] = {
      val y = new Array[Double](dim)
      var j = 0
      while (j < cfg.pqSubspaces) {
        val book = books(j); val base = j * sub
        var best = 0; var bd = Double.PositiveInfinity; var c = 0
        while (c < book.length) {
          var acc = 0.0; var i = 0
          while (i < sub) {
            val d = xr(base + i) - book(c)(i); acc += d * d; i += 1
          }
          if (acc < bd) { bd = acc; best = c }
          c += 1
        }
        System.arraycopy(book(best), 0, y, base, sub)
        j += 1
      }
      y
    }
    var rot = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var bestRot = rot
    var bestBooks: Array[Array[Array[Double]]] = null
    var bestMse = Double.PositiveInfinity
    for (it <- 0 until 6) {
      val xr = sample.map(matVec(rot, _))
      val books = Array.tabulate(cfg.pqSubspaces)(j =>
        fitSubRef(xr.map(_.slice(j * sub, (j + 1) * sub)),
          cfg.pqCentroids, cfg.seed + j))
      val ys = xr.map(reconstruct(books, _))
      val mse = xr.zip(ys).map { case (x, y) =>
        var acc = 0.0; var i = 0
        while (i < dim) { val d = x(i) - y(i); acc += d * d; i += 1 }
        acc
      }.sum / sample.length
      if (mse < bestMse) { bestMse = mse; bestRot = rot; bestBooks = books }
      if (it < 5) {
        val b = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
        sample.zip(ys).foreach { case (x, y) =>
          var i = 0
          while (i < dim) {
            var jj = 0
            while (jj < dim) { b(i, jj) += y(i) * x(jj); jj += 1 }
            i += 1
          }
        }
        val breeze.linalg.svd.SVD(u, _, vt) = breeze.linalg.svd(b)
        val r = u * vt
        rot = Array.tabulate(dim, dim)((i, j) => r(i, j))
      }
    }
    (bestRot, bestBooks)
  }

  // deterministic synthetic points (no RNG seeds shared with training)
  private def synthPts(n: Int, d: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(987654321L)
    Array.fill(n)(Array.fill(d)(rnd.nextDouble() * 4.0 - 2.0))
  }

  test("parallel fitSub is bit-identical to the sequential reference") {
    val pts = synthPts(2048, 16)
    for (k <- Seq(4, 16); seed <- Seq(42L, 1042L, 2042L)) {
      val a = graft.store.QuantModel.fitSub(pts, k, seed)
      val b = fitSubRef(pts, k, seed)
      assert(a.length == b.length)
      a.zip(b).foreach { case (ca, cb) =>
        assert(java.util.Arrays.equals(ca, cb),
          s"center drifted at k=$k seed=$seed")
      }
    }
  }

  test("fitSub stays exact when every point is identical (tot <= 0 path)") {
    val pts = Array.fill(64)(Array.fill(8)(1.5))
    val a = graft.store.QuantModel.fitSub(pts, 4, 42L)
    val b = fitSubRef(pts, 4, 42L)
    a.zip(b).foreach { case (ca, cb) =>
      assert(java.util.Arrays.equals(ca, cb))
    }
  }

  test("parallel trainOpq is bit-identical to the sequential reference") {
    val cfg = QuantConfig()
    val dim = 64
    val pts = synthPts(1024, dim)
    val (rotA, booksA) = graft.store.QuantModel.trainOpq(pts, cfg, dim)
    val (rotB, booksB) = trainOpqRef(pts, cfg, dim)
    rotA.zip(rotB).foreach { case (ra, rb) =>
      assert(java.util.Arrays.equals(ra, rb), "rotation drifted")
    }
    assert(booksA.length == booksB.length)
    booksA.zip(booksB).foreach { case (ba, bb) =>
      ba.zip(bb).foreach { case (ca, cb) =>
        assert(java.util.Arrays.equals(ca, cb), "opq book drifted")
      }
    }
  }

  test("stats pass matches the posexplode reference on sf0.001") {
    val df = Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long").as("id"), col("embedding"))
    val model = QuantModel.train(df, QuantConfig())
    // posexplode reference (pre-r15 shipped stats pass, verbatim)
    val st = df.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy("i").collect()
    val mins = st.map(_.getDouble(1))
    val scales = st.map { r =>
      val (mn, mx) = (r.getDouble(1), r.getDouble(2))
      if (mx > mn) 255.0 / (mx - mn) else 0.0
    }
    assert(java.util.Arrays.equals(model.mins, mins), "mins drifted")
    assert(java.util.Arrays.equals(model.scales, scales), "scales drifted")
  }

  test("full train on sf0.001 is bit-identical to the sequential chain") {
    val df = Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long").as("id"), col("embedding"))
    val cfg = QuantConfig()
    val model = QuantModel.train(df, cfg)
    val dim = model.dim
    val sub = dim / cfg.pqSubspaces
    // sequential sample derivation (pre-r15, verbatim): distributed
    // orderBy; the new path collects then driver-sorts
    val slim = df.select(col("id"), col("embedding").cast("array<double>").as("e"))
    val n = slim.count()
    val step = math.max(1L, n / cfg.sampleCap)
    val sample = slim.where(pmod(col("id"), lit(step)) === 0)
      .orderBy("id").collect().map(_.getSeq[Double](1).toArray)
    val ivf = fitSubRef(sample, cfg.ivfCells, cfg.seed + 2000)
    model.ivfCentroids.zip(ivf).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "ivf centroid drifted")
    }
    val books = Array.tabulate(cfg.pqSubspaces)(j =>
      fitSubRef(sample.map(_.slice(j * sub, (j + 1) * sub)),
        cfg.pqCentroids, cfg.seed + j))
    model.pqBooks.zip(books).foreach { case (ba, bb) =>
      ba.zip(bb).foreach { case (ca, cb) =>
        assert(java.util.Arrays.equals(ca, cb), "pq book drifted")
      }
    }
    val resSample = sample.map { p =>
      val c = ivf.minBy(cc => graft.functions.VectorFunctions.l2sqS(cc, p))
      Array.tabulate(dim)(i => p(i) - c(i))
    }
    val booksR = Array.tabulate(cfg.pqSubspaces)(j =>
      fitSubRef(resSample.map(_.slice(j * sub, (j + 1) * sub)),
        cfg.pqCentroids, cfg.seed + 1000 + j))
    model.pqrBooks.zip(booksR).foreach { case (ba, bb) =>
      ba.zip(bb).foreach { case (ca, cb) =>
        assert(java.util.Arrays.equals(ca, cb), "pqr book drifted")
      }
    }
    val (rot, booksO) = trainOpqRef(sample, cfg, dim)
    model.opqRot.zip(rot).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "opq rotation drifted")
    }
    model.opqBooks.zip(booksO).foreach { case (ba, bb) =>
      ba.zip(bb).foreach { case (ca, cb) =>
        assert(java.util.Arrays.equals(ca, cb), "opq book drifted")
      }
    }
  }
}
