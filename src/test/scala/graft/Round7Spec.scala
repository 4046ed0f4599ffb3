package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.ToyCnn

/** Round-7 surface: the hosted-featurizer path (x23) and its model
  * artifact.
  */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("ToyCnn artifact round-trips exactly") {
    val net = ToyCnn.seeded(7L, outDim = 16)
    val back = ToyCnn.fromBytes(net.toBytes)
    assert(back.kernel.sameElements(net.kernel))
    assert(back.bias == net.bias)
    assert(back.dense.length == 16)
    back.dense.zip(net.dense).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
  }

  test("featurize is deterministic and unit-norm") {
    val net = ToyCnn.seeded(20260813L)
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 8).foreach(x => (0 until 8).foreach(y =>
      img.getRaster.setSample(x, y, 0, (x * 8 + y * 3) % 256)))
    val e1 = net.featurize(img)
    val e2 = ToyCnn.fromBytes(net.toBytes).featurize(img)
    assert(e1.sameElements(e2), "session replay must be bit-identical")
    val n = math.sqrt(e1.map(v => v * v).sum)
    assert(math.abs(n - 1.0) < 1e-12, s"norm $n")
    assert(e1.exists(v => math.abs(v) > 1e-6),
      "embedding must not be degenerate-zero")
  }

  test("x23 distributed result equals the driver replay of the same net") {
    import org.apache.spark.sql.functions.col
    val rows = graft.queries.Round7Queries.all
      .find(_.name == "x23_neural_knn").get.run(spark, sf)
      .collect()
    assert(rows.length == 15, "5 queries x top-3")
    // per query: ranks 1..3 with ascending distances
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
      val ds = sorted.map(_.getDouble(3)).toSeq
      assert(ds == ds.sorted)
    }
    // the distributed top-1 per query equals a full driver replay:
    // featurize on the driver, exact distances over the collected
    // corpus — any drift in the executor-side decode/session/join
    // path surfaces here
    val net = ToyCnn.seeded(20260813L)
    val corpus = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    (0L until 5L).foreach { id =>
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until 8).foreach(x => (0 until 8).foreach(y =>
        img.getRaster.setSample(x, y, 0, ((id * 31 + x * 8 + y) % 256).toInt)))
      val q = net.featurize(img)
      val want = corpus.map { case (vid, e) =>
        (graft.functions.VectorFunctions.l2sqS(e, q), vid)
      }.min._2
      val got = rows.filter(r => r.getLong(0) == id && r.getInt(1) == 1)
        .head.getLong(2)
      assert(got == want, s"query $id: top-1 $got vs driver replay $want")
    }
  }

  test("featurizer runtime seam: registry resolves, adapters plug in") {
    import graft.ml.{Featurizers, FeaturizerRuntime, ImageFeaturizer, ToyCnn}
    // the registered in-container runtime is ToyCnn's exact math
    val net = ToyCnn.seeded(99L, outDim = 8)
    val loaded = Featurizers.forName("toycnn").load(net.toBytes)
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 8).foreach(x => (0 until 8).foreach(y =>
      img.getRaster.setSample(x, y, 0, (x * 8 + y) % 256)))
    assert(loaded.featurize(img).toSeq == net.featurize(img).toSeq)
    // a third-party adapter (the ONNX integration shape) registers and
    // resolves by name; unknown names fail loudly with the inventory
    object StubRuntime extends FeaturizerRuntime {
      val name = "stub-onnx"
      def load(bytes: Array[Byte]): ImageFeaturizer = new ImageFeaturizer {
        def outDim = 2
        def featurize(i: java.awt.image.BufferedImage) =
          Array(bytes.length.toDouble, i.getWidth.toDouble)
      }
    }
    Featurizers.register(StubRuntime)
    assert(Featurizers.forName("stub-onnx")
      .load(Array[Byte](1, 2, 3)).featurize(img).toSeq == Seq(3.0, 8.0))
    val e = intercept[IllegalArgumentException](Featurizers.forName("nope"))
    assert(e.getMessage.contains("stub-onnx") &&
      e.getMessage.contains("toycnn"))
  }
}
