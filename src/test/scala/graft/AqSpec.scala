package graft

import graft.operators.{Aq, Pq}
import org.apache.spark.sql.functions._

class AqSpec extends SparkSpec {
  import spark.implicits._

  private def recon(model1: Pq.PqModel, model2: Pq.PqModel,
                    x: Array[Double], codes: Seq[Int]): Double = {
    val m = model1.m
    val dsub = model1.dsub
    (0 until m).map { j =>
      val u = model1.codebooks(j)(codes(j))
      val v = model2.codebooks(j)(codes(m + j))
      (0 until dsub).map { i =>
        val r = x(j * dsub + i) - u(i) - v(i)
        r * r
      }.sum
    }.sum
  }

  private def corpus = vecsDf((0 until 40).map { i =>
    val a = i * 0.37
    (i.toLong, Seq(math.cos(a), math.sin(a), math.cos(2 * a) * 0.4,
      math.sin(3 * a) * 0.4, math.cos(5 * a) * 0.2, math.sin(7 * a) * 0.2,
      (i % 3 - 1) * 0.3, (i % 5 - 2) * 0.1).map(_.toFloat))
  }: _*)

  test("joint encode never reconstructs worse than greedy RVQ " +
    "encode on the same codebooks") {
    val df = corpus
    val cb1 = Pq.trainCodebooks(df, "vec_id", "embedding",
      m = 2, k = 4, maxIter = 3)
    val cb2 = Pq.trainCodebooks(
      Pq.residuals(df, "vec_id", "embedding", cb1),
      "vec_id", "embedding", m = 2, k = 4, maxIter = 3)
    val xs = df.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    val greedy = Pq.encode(df, "vec_id", "embedding", cb1)
      .withColumnRenamed("codes", "c1")
      .join(Pq.encode(Pq.residuals(df, "vec_id", "embedding", cb1),
        "vec_id", "embedding", cb2).withColumnRenamed("codes", "c2"),
        Seq("vec_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1) ++ r.getSeq[Int](2))).toMap
    val joint = Aq.encodeJoint(df, "vec_id", "embedding", cb1, cb2)
      .select("vec_id", "codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    var strictly = 0
    xs.foreach { case (id, x) =>
      val g = recon(cb1, cb2, x, greedy(id))
      val j = recon(cb1, cb2, x, joint(id))
      assert(j <= g + 1e-9, s"vec $id: joint $j > greedy $g")
      if (j < g - 1e-12) strictly += 1
    }
    assert(strictly > 0, "joint should strictly improve somewhere")
  }

  test("refine() is monotone: each alternating pass does not increase " +
    "total joint reconstruction error (up to rounding)") {
    val df = corpus
    val cb1 = Pq.trainCodebooks(df, "vec_id", "embedding",
      m = 2, k = 4, maxIter = 2)
    val cb2 = Pq.trainCodebooks(
      Pq.residuals(df, "vec_id", "embedding", cb1),
      "vec_id", "embedding", m = 2, k = 4, maxIter = 2)
    val xs = df.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    def totalErr(m1: Pq.PqModel, m2: Pq.PqModel): Double = {
      val codes = Aq.encodeJoint(df, "vec_id", "embedding", m1, m2)
        .select("vec_id", "codes")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      xs.map { case (id, x) => recon(m1, m2, x, codes(id)) }.sum
    }
    val e0 = totalErr(cb1, cb2)
    val (u1, v1) = Aq.refine(df, "vec_id", "embedding", cb1, cb2, 1)
    val e1 = totalErr(u1, v1)
    val (u2, v2) = Aq.refine(df, "vec_id", "embedding", cb1, cb2, 2)
    val e2 = totalErr(u2, v2)
    assert(e1 <= e0 + 1e-6, s"pass 1 worsened: $e0 -> $e1")
    assert(e2 <= e1 + 1e-6, s"pass 2 worsened: $e1 -> $e2")
  }
}
