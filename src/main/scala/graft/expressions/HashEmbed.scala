package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic feature-hashing embedder as a single-pass kernel:
  * lowercase → whitespace tokens → per token one 60-bit md5 bucket and
  * one signed vote → scatter-add into a dim-slot array → L2 normalize.
  *
  * This is the zero-egress stand-in for the reference's OpenAI embedding
  * call (reference embed.js:135-151). Implemented as a Catalyst
  * expression (not a column pipeline) because the scatter-add is
  * O(tokens) here versus O(tokens × dim) for the `aggregate`/`transform`
  * formulation — per-document work, no shuffle, embarrassingly parallel
  * at any scale.
  *
  * Hash semantics match [[graft.functions.HashFunctions.md5Long]]
  * (first 15 hex chars of md5 as a non-negative Long) so the result is
  * SQL-oracle-reproducible: bucket = md5_60(w) mod dim, sign from bit 0
  * of md5_60("sign:" + w).
  */
case class HashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "hash_embed"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"hash_embed requires a string input, " +
      s"got ${child.dataType.sql}")
  }

  import Md5Util.md5_60

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val acc = new Array[Double](dim)
    val trimmed = text.trim
    if (trimmed.nonEmpty) {
      for (w <- trimmed.split("\\s+")) {
        val bucket = (md5_60(w) % dim).toInt
        val sign = if ((md5_60("sign:" + w) & 1L) == 1L) 1.0 else -1.0
        acc(bucket) += sign
      }
    }
    var norm2 = 0.0
    var i = 0
    while (i < dim) { norm2 += acc(i) * acc(i); i += 1 }
    if (norm2 > 0.0) {
      // divide (not multiply-by-reciprocal): bit-identical to the SQL
      // oracle's v / norm
      val norm = math.sqrt(norm2)
      i = 0
      while (i < dim) { acc(i) /= norm; i += 1 }
    }
    new GenericArrayData(acc)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
