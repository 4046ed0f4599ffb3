package graft.ml

/** Deterministic toy convnet standing in for the reference's ResNet50
  * image featurizer (`generate_coco_embeddings.py:33-41`,
  * `image_search.py:31-58` — the neural net itself is out of engine
  * scope per SURVEY §2.1: no model weights ship in-container).
  *
  * What IS the engine's job — and what this class exists to prove out
  * end-to-end — is the HOSTING pattern a real ONNX/TF session uses on
  * Spark: the model is a serialized byte artifact, broadcast once,
  * and deserialized ONE TIME PER PARTITION inside `mapPartitions`
  * (never per row); rows stream through the loaded session. Swap
  * [[ToyCnn.fromBytes]] for `OrtEnvironment.createSession(bytes)` and
  * [[featurize]] for `session.run` and the surrounding plan is
  * unchanged — schema, broadcast, partitioning, join shape all carry
  * over.
  *
  * Architecture (all math exact and replayed driver-side for the
  * oracle): 3×3 valid conv over the 8×8 grayscale raster (pixels
  * scaled to [0,1]) + bias + |·| activation (abs, not ReLU — a random
  * untrained kernel with a negative sum can drive EVERY pre-activation
  * negative, and ReLU would collapse the whole feature map to zero) →
  * flatten (36) → dense 36→`outDim` → L2 normalize (zero-norm rule:
  * divisor 1). Weights are seeded pseudo-random — a fixed artifact,
  * like any trained checkpoint.
  */
final class ToyCnn(
    val kernel: Array[Double], // 9 = 3×3
    val bias: Double,
    val dense: Array[Array[Double]]) // outDim rows × 36 cols
    extends ImageFeaturizer {

  def outDim: Int = dense.length

  /** 8×8 single-channel image → unit-norm embedding. */
  def featurize(img: java.awt.image.BufferedImage): Array[Double] = {
    require(img.getWidth == 8 && img.getHeight == 8,
      s"ToyCnn expects 8x8 input, got ${img.getWidth}x${img.getHeight}")
    val conv = new Array[Double](36)
    var x = 0
    var idx = 0
    while (x < 6) {
      var y = 0
      while (y < 6) {
        var acc = bias
        var kx = 0
        while (kx < 3) {
          var ky = 0
          while (ky < 3) {
            acc += kernel(kx * 3 + ky) *
              (img.getRaster.getSample(x + kx, y + ky, 0) / 255.0)
            ky += 1
          }
          kx += 1
        }
        conv(idx) = math.abs(acc)
        idx += 1
        y += 1
      }
      x += 1
    }
    val out = new Array[Double](outDim)
    var o = 0
    while (o < outDim) {
      val row = dense(o)
      var acc = 0.0
      var i = 0
      while (i < 36) { acc += row(i) * conv(i); i += 1 }
      out(o) = acc
      o += 1
    }
    var nsq = 0.0
    o = 0
    while (o < outDim) { nsq += out(o) * out(o); o += 1 }
    val n = if (nsq == 0.0) 1.0 else math.sqrt(nsq)
    o = 0
    while (o < outDim) { out(o) /= n; o += 1 }
    out
  }

  /** The model artifact: a flat double-array blob (the stand-in for an
    * `.onnx` file's bytes).
    */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * (9 + 1 + outDim * 36))
    bb.putInt(outDim)
    kernel.foreach(bb.putDouble)
    bb.putDouble(bias)
    dense.foreach(_.foreach(bb.putDouble))
    bb.array()
  }
}

object ToyCnn {

  /** Deterministic "trained checkpoint" for a seed. */
  def seeded(seed: Long, outDim: Int = 64): ToyCnn = {
    val rnd = new scala.util.Random(seed)
    val kernel = Array.fill(9)(rnd.nextDouble() * 2 - 1)
    val bias = rnd.nextDouble() * 0.1
    val dense = Array.fill(outDim)(Array.fill(36)(rnd.nextDouble() * 2 - 1))
    new ToyCnn(kernel, bias, dense)
  }

  def fromBytes(bytes: Array[Byte]): ToyCnn = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val outDim = bb.getInt
    val kernel = Array.fill(9)(bb.getDouble)
    val bias = bb.getDouble
    val dense = Array.fill(outDim)(Array.fill(36)(bb.getDouble))
    new ToyCnn(kernel, bias, dense)
  }
}
