package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization to int8 (SQ8) — the standard first compression
  * rung for vector serving (FAISS `ScalarQuantizer` QT_8bit; the same
  * knob Milvus and pgvector expose): per-DIMENSION symmetric affine,
  * s_j = max over the corpus of |x_j|, code_j = round(x_j / s_j · 127)
  * stored as a tinyint, reconstruction code_j · s_j / 127. Unlike PQ
  * ([[Pq]]) there is no training loop — the whole "codebook" is one
  * scale per dimension derived by a single aggregation — and no
  * codebook staleness under appends (a new corpus max only widens
  * s_j; old codes stay decodable with the old scales).
  *
  * Scale shape: the scale row is d doubles (model-sized) and is
  * BROADCAST into the quantize/dequantize passes — the corpus is
  * touched by one narrow map each way, no shuffle, no driver-side
  * per-row loop. At 100 TB the codes frame is the resident serving
  * representation (4× smaller than float32); [[graft.queries
  * .VectorQueries.refDimSq8Serve]] (v61) pins what that buys at the
  * reference dimension.
  *
  * All arithmetic is double (float inputs widen exactly) in a fixed
  * operation order — x / s · 127, then half-away-from-zero round —
  * so a straightforward SQL oracle replays the codes bit-identically.
  */
object Sq8 {

  /** Floor for dead dimensions (all-zero across the corpus): keeps
    * x / s finite; codes for such dims are exactly 0.
    */
  val DeadDimFloor = 1e-30

  /** One-row frame with column `scales`: array of per-dimension
    * symmetric scales s_j = max |x_j| over `vectors`, ordered by
    * dimension (array_sort on a (pos, s) struct sorts by the leading
    * field). One posexplode + one d-group aggregation — the only
    * corpus-wide pass SQ8 needs.
    */
  def scalesRow(vectors: DataFrame, vecCol: String): DataFrame =
    vectors
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(greatest(max(abs(col("x"))).cast("double"),
        lit(DeadDimFloor)).as("s"))
      .agg(array_sort(collect_list(struct(col("pos"), col("s"))))
        .as("ps"))
      .select(transform(col("ps"), p => p.getField("s")).as("scales"))

  /** The quantize column expression: array<tinyint> codes, SATURATED
    * to [-127, 127] (FAISS's QT_8bit discipline). When the scales are
    * the corpus's own max-|x| statistics the clamp is a no-op (|x| ≤
    * s by construction — v61's regime); under FROZEN scales applied
    * to later-arriving data (the LSM cell, v80) out-of-range values
    * saturate instead of overflowing, and the cost surfaces in the
    * per-row cosine-fidelity meter rather than as a cast error. */
  def quantizeCol(vec: Column, scales: Column): Column =
    zip_with(vec, scales,
      (x, s) => least(greatest(round(x / s * lit(127), 0),
        lit(-127.0)), lit(127.0)).cast("tinyint"))

  /** The dequantize column expression: array<double> reconstruction.
    * Exact given the integral codes — no rounding on this side. */
  def dequantizeCol(code: Column, scales: Column): Column =
    zip_with(code, scales,
      (qc, s) => qc.cast("double") * s / lit(127))

  /** `vectors` with `vecCol` replaced by its int8 round-trip
    * reconstruction (array<double>) and the codes alongside:
    * (idCol, code: array<tinyint>, vecCol: array<double>). The scale
    * row is broadcast; the corpus is mapped once.
    */
  def roundTrip(vectors: DataFrame, idCol: String, vecCol: String,
                scales: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(scales))
      .withColumn("code", quantizeCol(col(vecCol), col("scales")))
      .select(col(idCol), col("code"),
        dequantizeCol(col("code"), col("scales")).as(vecCol))
}
