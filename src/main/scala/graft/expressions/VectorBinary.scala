package graft.expressions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Binary interop with the reference's on-disk vector format: packed
  * little-endian float32 (reference server.js:194 encode, server.js:86
  * decode; 1536 floats = 6144 bytes per row in its vectors.db). These
  * expressions let the engine ingest such blobs directly (SURVEY.md §2.1
  * O3/O4) — Parquet-native ArrayType(FloatType) stays the preferred
  * at-rest layout.
  */
case class FloatVectorFromBinary(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "float_vector_from_binary"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == BinaryType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName requires binary input, " +
      s"got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](bytes.length / 4)
    var i = 0
    while (i < out.length) { out(i) = buf.getFloat(i * 4); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

case class FloatVectorToBinary(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "float_vector_to_binary"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires array<float> input, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = ByteBuffer.allocate(n * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { buf.putFloat(arr.getFloat(i)); i += 1 }
    buf.array()
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
