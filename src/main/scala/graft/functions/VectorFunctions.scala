package graft.functions

import graft.expressions.{CosineSimilarity, DotProduct, L2Distance}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Column-level vector math.
  *
  * Two implementations of each kernel:
  *   - `cosineSim`/`dotProduct`/`l2Dist`: custom codegen'd Catalyst
  *     expressions (single pass, no boxing) — the hot path.
  *   - `*Hof`: the same math composed from built-in higher-order
  *     functions (`zip_with` + `aggregate`) — SQL-expressible, used to
  *     cross-check the custom expressions in tests.
  *
  * Both accumulate sequentially in Double so they agree bit-for-bit.
  */
object VectorFunctions {

  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def l2Dist(a: Column, b: Column): Column =
    Bridge.column(L2Distance(Bridge.expression(a), Bridge.expression(b)))

  /** Reference blob-format codec (little-endian float32; SURVEY §2.1
    * O3/O4). */
  def floatVectorFromBinary(b: Column): Column =
    Bridge.column(graft.expressions.FloatVectorFromBinary(Bridge.expression(b)))

  def floatVectorToBinary(v: Column): Column =
    Bridge.column(graft.expressions.FloatVectorToBinary(Bridge.expression(v)))

  /** Symmetric int8 quantization codes (see
    * [[graft.expressions.Int8Quantize]]); feed straight into
    * [[cosineSim]] — per-vector scale cancels. */
  def int8Quantize(v: Column): Column =
    Bridge.column(graft.expressions.Int8Quantize(Bridge.expression(v)))

  /** Mismatched dimensions RAISE, matching the kernel expressions'
    * [[graft.expressions.VectorBinaryExpression]] semantics — without
    * this, zip_with's null-padding would make the "bit-identical" HOF
    * twin silently diverge from the kernel on bad input.
    */
  private def requireSameDim(a: Column, b: Column, op: String,
                             result: Column): Column =
    when(size(a) =!= size(b),
      raise_error(concat(lit(s"$op: vector dimensions differ: "),
        size(a).cast("string"), lit(" vs "), size(b).cast("string")))
        .cast("double"))
      .otherwise(result)

  /** dot(a,b) via built-ins: aggregate(zip_with(a, b, *), 0.0, +). */
  def dotProductHof(a: Column, b: Column): Column =
    requireSameDim(a, b, "dot_product_hof",
      aggregate(
        zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0),
        (acc, x) => acc + x))

  def l2NormHof(a: Column): Column = sqrt(dotProductHof(a, a))

  /** Zero-norm-guarded cosine from built-ins (reference yields NaN there —
    * server.js:46-51; we define it as 0.0, see SURVEY.md §2.1 O11). */
  def cosineSimHof(a: Column, b: Column): Column = {
    val na = l2NormHof(a)
    val nb = l2NormHof(b)
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dotProductHof(a, b) / (na * nb))
  }

  /** L2-normalize a vector column; zero vectors pass through unchanged. */
  def l2Normalize(a: Column): Column = {
    val n = l2NormHof(a)
    when(n === 0.0, a).otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Element-wise mean of an array-of-vectors column (all same length) —
    * used for IVF centroid refinement. Pure built-ins: reduce by
    * zip_with(+), then scale. */
  def vectorMean(vectors: Column): Column = {
    val summed = aggregate(
      vectors,
      array().cast("array<double>"),
      (acc, v) =>
        when(size(acc) === 0, transform(v, x => x.cast("double")))
          .otherwise(zip_with(acc, v, (x, y) => x + y.cast("double"))))
    transform(summed, x => x / size(vectors))
  }
}
