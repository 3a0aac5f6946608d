package graft

import graft.expressions.{CosineLshBits, CosineSimilarity, DotProduct, FloatVectorFromBinary, FloatVectorToBinary, HashEmbed, Int8Quantize, L2Distance, Md5LongArray, MinHashSignature, ShingleHashes, SimHashBits}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge

/** SQL surface for the custom expressions: the vector kernels
  * (`cosine_sim`, `dot_product`, `l2_distance`, `int8_quantize`, the
  * float32-blob codec) AND the hash/dedup kernels (`hash_embed`,
  * `md5_long_array`, `shingle_hashes`, `minhash_signature`,
  * `simhash_bits`, `cosine_lsh_bits`) become callable from `spark.sql`
  * text — the whole toolkit is usable from pure SQL deployments.
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

  /** Fold a required-literal int argument (kernel widths/dims are
    * constructor parameters, not runtime columns — the same contract as
    * Spark's own `approx_count_distinct(col, 0.05)` precision arg).
    */
  private def intArg(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: the int argument must be a literal")
    e.eval() match {
      case i: Int if i >= 1 => i
      case l: Long if l >= 1L && l <= Int.MaxValue => l.toInt
      case other =>
        // negative/zero widths would NegativeArraySizeException per-row
        // at execution, and an out-of-Int-range Long would silently
        // wrap via toInt — both must die at analysis time instead
        throw new IllegalArgumentException(
          s"$fn: expected a positive integer literal (<= ${Int.MaxValue}), " +
            s"got $other")
    }
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (args => CosineSimilarity(args(0), args(1))),
    "dot_product" -> (args => DotProduct(args(0), args(1))),
    "l2_distance" -> (args => L2Distance(args(0), args(1))),
    "float_vector_from_binary" -> (args => FloatVectorFromBinary(args(0))),
    "float_vector_to_binary" -> (args => FloatVectorToBinary(args(0))),
    "int8_quantize" -> (args => Int8Quantize(args(0))),
    // hash kernels — the full dedup/sketch toolkit from SQL text
    "hash_embed" ->
      (args => HashEmbed(args(0), intArg(args(1), "hash_embed"))),
    "md5_long_array" -> (args => Md5LongArray(args(0))),
    "shingle_hashes" ->
      (args => ShingleHashes(args(0), intArg(args(1), "shingle_hashes"))),
    "minhash_signature" ->
      (args => MinHashSignature(args(0),
        intArg(args(1), "minhash_signature"))),
    "simhash_bits" ->
      (args => SimHashBits(args(0), intArg(args(1), "simhash_bits"))),
    "cosine_lsh_bits" ->
      (args => CosineLshBits(args(0), intArg(args(1), "cosine_lsh_bits"))),
    "nfc_normalize" ->
      (args => graft.expressions.NfcNormalize(args(0))))

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
