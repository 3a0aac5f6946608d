package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** vector → R·vector: a dense orthogonal change of basis applied as a
  * narrow kernel pass — the serving shape of a LEARNED TRANSFORM in
  * front of a quantizer (OPQ's rotation, Ge et al. CVPR 2013; PCA
  * whitening; random rotation). The matrix rides the expression like
  * [[PqEncode]]'s codebooks ride theirs: at d = 64 that is 32 KiB, at
  * the reference d = 1536 it is ~18 MiB — still a per-STAGE cost (the
  * task binary is torrent-broadcast once per executor), but past a few
  * thousand dimensions move the matrix to an explicit Broadcast and a
  * mapPartitions kernel instead.
  *
  * Arithmetic contract (what the SQL oracle replays): each output
  * component o is the SEQUENTIAL double dot product
  * Σ_i rows(o)(i) · x(i), i ascending, inputs widened to double before
  * multiplying. Output is the RAW dot — callers round (builtin
  * `round`, mirrored by DuckDB's `round`) before anything
  * rank-sensitive consumes the values, so cross-engine summation-order
  * noise (~1e-16 relative) can never flip a downstream argmin.
  */
case class MatVecRotate(child: Expression, rows: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "matvec_rotate"
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires array<float|double> input, got ${other.sql}")
    }
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = rows.length
    if (arr.numElements() != dim) throw new IllegalArgumentException(
      s"$prettyName: vector dim ${arr.numElements()} != $dim")
    @inline def at(i: Int): Double =
      if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
    val out = new Array[Double](dim)
    var o = 0
    while (o < dim) {
      val row = rows(o)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += row(i) * at(i)
        i += 1
      }
      out(o) = acc
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
