package graft

import graft.expressions.{CosineSimilarity, DotProduct, FloatVectorFromBinary, FloatVectorToBinary, Int8Quantize, L2Distance}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge

/** SQL surface for the custom vector expressions: `cosine_sim`,
  * `dot_product`, `l2_distance` become callable from `spark.sql` text.
  *
  * Two registration paths:
  *   - [[GraftFunctions.register]] — imperative, on an existing session
  *     (what [[SparkEntry]] queries use).
  *   - [[GraftExtensions]] — declarative, via
  *     `spark.sql.extensions=graft.GraftExtensions` in cluster conf, the
  *     deployment-grade path (`SparkSession.builder.withExtensions` in
  *     tests).
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (args => CosineSimilarity(args(0), args(1))),
    "dot_product" -> (args => DotProduct(args(0), args(1))),
    "l2_distance" -> (args => L2Distance(args(0), args(1))),
    "float_vector_from_binary" -> (args => FloatVectorFromBinary(args(0))),
    "float_vector_to_binary" -> (args => FloatVectorToBinary(args(0))),
    "int8_quantize" -> (args => Int8Quantize(args(0))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, b) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        b))
    }
}
