package graft

import graft.operators.Sq8
import org.apache.spark.sql.functions._

class Sq8Spec extends SparkSpec {
  import spark.implicits._

  // mixed magnitudes per dimension, a negative-max dim, and a DEAD
  // (all-zero) third dimension — the guard case
  private def emb = vecsDf(
    (1L, Seq(1.0f, -0.25f, 0f, 0.01f)),
    (2L, Seq(0.5f, -2.0f, 0f, -0.01f)),
    (3L, Seq(-0.75f, 1.5f, 0f, 0.005f)),
    (4L, Seq(0.25f, 0.5f, 0f, -0.002f)))

  private lazy val scales = Sq8.scalesRow(emb, "embedding")

  test("scalesRow: per-dim max |x|, dead dims floored") {
    val s = scales.as[Seq[Double]].head()
    // float inputs widen exactly: the expected scale is the DOUBLE
    // value of the float literal 0.01f, not the double 0.01
    assert(s == Seq(1.0, 2.0, Sq8.DeadDimFloor, 0.01f.toDouble))
  }

  test("roundTrip: codes in [-127,127], max elements hit ±127, dead dim 0") {
    val rt = Sq8.roundTrip(emb, "vec_id", "embedding", scales)
    val codes = rt.select(col("vec_id"), col("code"))
      .as[(Long, Seq[Byte])].collect().toMap
    assert(codes.values.forall(_.forall(c => c >= -127 && c <= 127)))
    assert(codes(1L)(0) == 127)  // x == s  -> full-scale code
    assert(codes(2L)(1) == -127) // x == -s -> negative full scale
    assert(codes.values.forall(_(2) == 0)) // dead dim quantizes to 0
  }

  test("roundTrip: reconstruction within half a quantization step") {
    val s = scales.as[Seq[Double]].head()
    val deq = Sq8.roundTrip(emb, "vec_id", "embedding", scales)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect().toMap
    val orig = emb.as[(Long, Seq[Float])].collect().toMap
    for ((id, xs) <- orig; (x, j) <- xs.zipWithIndex) {
      val step = s(j) / 127.0
      assert(math.abs(x.toDouble - deq(id)(j)) <= step / 2 + 1e-12,
        s"vec $id dim $j: ${x.toDouble} vs ${deq(id)(j)}")
    }
  }

  test("roundTrip: deterministic across invocations") {
    def run() = Sq8.roundTrip(emb, "vec_id", "embedding",
        Sq8.scalesRow(emb, "embedding"))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(run() == run())
  }
}
