package graft.extensions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.expressions._

/** SQL surface for the engine's native kernels: the reference exposes
  * no pluggable function API at all (SURVEY §2.8); here every vector /
  * text kernel is a first-class SQL function, injectable at session
  * build time (`.withExtensions(new GraftExtensions)`) or registered
  * into an existing session (`GraftExtensions.register(spark)`).
  *
  * Usage: `spark.sql("SELECT vec_l2sq(a.embedding, b.embedding) ...")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("scala_udf", name), builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.AsOfJoinColumnPruning)
  }
}

object GraftExtensions {
  private def arg(es: Seq[Expression], i: Int, name: String, n: Int): Expression = {
    require(es.length == n, s"$name expects $n arguments, got ${es.length}")
    es(i)
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(arg(es, 0, "vec_dot", 2), es(1))),
    "vec_l2sq" -> (es => VecL2Sq(arg(es, 0, "vec_l2sq", 2), es(1))),
    "vec_norm" -> (es => VecNorm(arg(es, 0, "vec_norm", 1), safe = false)),
    "vec_safe_norm" -> (es => VecNorm(arg(es, 0, "vec_safe_norm", 1), safe = true)),
    "vec_l2normalize" -> (es => VecL2Normalize(arg(es, 0, "vec_l2normalize", 1))),
    "text_poly_hash" -> (es => TextPolyHash(arg(es, 0, "text_poly_hash", 1), Int.MaxValue)),
    "text_word_hashes" -> (es => TextWordHashes(arg(es, 0, "text_word_hashes", 1))),
    "text_trigram_distinct" -> (es =>
      TextTrigramDistinct(arg(es, 0, "text_trigram_distinct", 1))),
    // UDTF: LATERAL VIEW text_shingles(text, 3). Shingle size must be a
    // literal int.
    "text_shingles" -> (es => {
      require(es.length == 2, s"text_shingles expects 2 arguments, got ${es.length}")
      val n = es(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"text_shingles size must be an INT literal, got $other")
      }
      TextShingles(es(0), n)
    })
  )

  /** Register into an already-built session (temp functions + the
    * as-of-join planner strategy via experimental.extraStrategies).
    */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.AsOfJoinColumnPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.AsOfJoinColumnPruning
  }
}
