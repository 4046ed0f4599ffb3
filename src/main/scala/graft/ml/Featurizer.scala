package graft.ml

/** Pluggable image-featurizer runtime — THE production integration
  * point for a real neural runtime (the reference's ResNet50,
  * `generate_coco_embeddings.py:33-41` / `image_search.py:31-58`).
  *
  * The hosting contract x23 proves end-to-end is runtime-agnostic:
  * the model is a byte artifact broadcast once; [[FeaturizerRuntime
  * .load]] runs ONCE PER PARTITION inside `mapPartitions` (never per
  * row); rows stream through the loaded [[ImageFeaturizer]]. An ONNX
  * integration is one object:
  *
  * {{{
  * object OnnxRuntimeAdapter extends FeaturizerRuntime {
  *   val name = "onnx"
  *   def load(modelBytes: Array[Byte]): ImageFeaturizer = {
  *     val env = ai.onnxruntime.OrtEnvironment.getEnvironment
  *     val session = env.createSession(modelBytes)
  *     new ImageFeaturizer {
  *       def outDim = ...          // from session output metadata
  *       def featurize(img) = ...  // raster → OnnxTensor → session.run
  *     }
  *   }
  * }
  * Featurizers.register(OnnxRuntimeAdapter)
  * }}}
  *
  * and the x23 plan — schema, broadcast, per-partition session,
  * join shape, oracle — is untouched (`Round7Queries.x23` consumes
  * only this interface). No ONNX/TF jar ships in this container, so
  * [[ToyCnn]] (exact, seeded, driver-replayable) is the registered
  * stand-in; its arithmetic being replayable is what lets the DuckDB
  * oracle hash-check the full hosted path.
  */
trait ImageFeaturizer extends Serializable {
  def outDim: Int

  /** Decoded image → embedding (unit-norm by convention; the zero-norm
    * rule — divisor 1.0 — matches the engine's `vec_l2normalize`).
    */
  def featurize(img: java.awt.image.BufferedImage): Array[Double]
}

/** Deserializes a broadcast model artifact into a live session. The
  * instance itself must be serializable (it rides the task closure);
  * the session it loads must not be (load per partition instead).
  */
trait FeaturizerRuntime extends Serializable {
  def name: String
  def load(modelBytes: Array[Byte]): ImageFeaturizer
}

/** Runtime registry: resolve by name so a query can name its runtime
  * without compiling against it.
  */
object Featurizers {
  private val registry =
    scala.collection.concurrent.TrieMap[String, FeaturizerRuntime](
      ToyCnnRuntime.name -> ToyCnnRuntime)

  def register(rt: FeaturizerRuntime): Unit = registry.put(rt.name, rt)

  def forName(name: String): FeaturizerRuntime =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"no featurizer runtime '$name' registered " +
        s"(available: ${registry.keys.toSeq.sorted.mkString(", ")})"))
}

/** The in-container runtime: exact seeded convnet ([[ToyCnn]]). */
object ToyCnnRuntime extends FeaturizerRuntime {
  val name = "toycnn"
  def load(modelBytes: Array[Byte]): ImageFeaturizer =
    ToyCnn.fromBytes(modelBytes)
}
