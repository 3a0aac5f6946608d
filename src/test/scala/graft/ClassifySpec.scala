package graft

import graft.operators.Classify

/** Nearest-class-mean classifier: training aggregate and argmax
  * assignment semantics.
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def v(xs: Double*) = xs.map(_.toFloat)

  test("classMeans averages per dimension within each class") {
    val train = Seq(
      (0L, v(1.0, 0.0)), (0L, v(3.0, 2.0)),
      (1L, v(0.0, 4.0)))
      .toDF("cls", "embedding")
    val got = Classify.classMeans(train, "cls", "embedding")
      .orderBy("cls").as[(Long, Seq[Float])].collect().toSeq
    assert(got == Seq((0L, v(2.0, 1.0)), (1L, v(0.0, 4.0))))
  }

  test("nearestClassAssign: cosine argmax, ties to the lower class id") {
    val means = Seq((0L, v(1.0, 0.0)), (1L, v(0.0, 1.0)))
      .toDF("cls", "centroid")
    val emb = Seq(
      (10L, v(0.9, 0.1)),  // -> class 0
      (11L, v(0.1, 0.9)),  // -> class 1
      (12L, v(0.5, 0.5)))  // exact tie -> class 0
      .toDF("vec_id", "embedding")
    val got = Classify
      .nearestClassAssign(emb, means, "vec_id", "embedding", "cls")
      .select("vec_id", "pred")
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 0L), (11L, 1L), (12L, 0L)))
  }

  test("nearestClassLit matches nearestClassAssign (model-as-literal " +
      "twin, incl. the tie)") {
    val means = Seq((0L, v(1.0, 0.0)), (1L, v(0.0, 1.0)))
      .toDF("cls", "centroid")
    val emb = Seq(
      (10L, v(0.9, 0.1)), (11L, v(0.1, 0.9)), (12L, v(0.5, 0.5)))
      .toDF("vec_id", "embedding")
    val model = means.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq.sortBy(_._1)
    val viaLit = emb.select(org.apache.spark.sql.functions.col("vec_id"),
        Classify.nearestClassLit(
          org.apache.spark.sql.functions.col("embedding"), model)
          .as("pred"))
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    val viaJoin = Classify
      .nearestClassAssign(emb, means, "vec_id", "embedding", "cls")
      .select("vec_id", "pred")
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(viaLit == viaJoin)
  }
}
