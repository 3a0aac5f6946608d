package graft

import graft.queries.{QuantGate, ServeGate}
import org.scalatest.funsuite.AnyFunSuite

/** The SERVE-PATH gate discipline (round 15, verdict item 4): the
  * composed index snapshot's measured end-to-end recall seals beside
  * the graph artifact, and a COMPOSED regression — healthy codebooks,
  * wrong geometry/entries — trips it where every per-model QuantGate
  * stays green. */
class ServeGateSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import org.apache.spark.sql.functions._

  // two well-separated clusters in 4-d: ids 1-4 near +x, ids 11-14
  // near +y; the held-out query sits in the +x cluster
  private def corpus = {
    import spark.implicits._
    val rows =
      (1 to 4).map(i => (i.toLong,
        Seq(1f, 0.01f * i, 0f, 0f))) ++
      (11 to 14).map(i => (i.toLong,
        Seq(0f, 1f, 0.01f * (i - 10), 0f)))
    rows.toDF("vec_id", "embedding")
  }
  private def qDf = {
    import spark.implicits._
    Seq(Tuple1(Seq(1f, 0.02f, 0.01f, 0f))).toDF("qe")
  }
  // the healthy graph: each node linked within its own cluster
  private def goodGraph = {
    import spark.implicits._
    (for {
      s <- Seq(1L, 2L, 3L, 4L); d <- Seq(1L, 2L, 3L, 4L) if s != d
    } yield (s, d)).++(for {
      s <- Seq(11L, 12L, 13L, 14L); d <- Seq(11L, 12L, 13L, 14L)
      if s != d
    } yield (s, d)).toDF("src", "dst")
  }

  test("healthy composed path seals above its floor and re-checks " +
      "clean on load") {
    val scales = graft.operators.Sq8.scalesRow(corpus, "embedding")
    val recall = ServeGate.sq8WalkRecall(corpus, goodGraph,
      entries = Seq(1L, 11L), scales, qDf, "vec_id", "embedding",
      beam = 4, rounds = 2)
    assert(recall >= 0.9, s"healthy path recall $recall")
    QuantGate.seal(spark, "spec_serve_ok", "/tmp/servegate_spec",
      recall, floor = 0.8, note = "spec fixture, healthy geometry")
    QuantGate.check(spark, "spec_serve_ok", "/tmp/servegate_spec")
  }

  test("composed-geometry regression trips the gate with every " +
      "codebook healthy: entries routed to the wrong cluster") {
    // same corpus, same (exact) SQ8 scales — the quantizer is
    // perfectly healthy; the regression is PURE geometry: the entry
    // list routes every walk into the wrong cluster and the graph
    // keeps it there (the v54 entry-routing failure in miniature)
    val scales = graft.operators.Sq8.scalesRow(corpus, "embedding")
    val recall = ServeGate.sq8WalkRecall(corpus, goodGraph,
      entries = Seq(11L), scales, qDf, "vec_id", "embedding",
      beam = 4, rounds = 2)
    assert(recall <= 0.5, s"wrong-cluster walk recall $recall")
    val ex = intercept[IllegalArgumentException] {
      QuantGate.seal(spark, "spec_serve_bad", "/tmp/servegate_spec",
        recall, floor = 0.8, note = "spec fixture, wrong entries")
    }
    assert(ex.getMessage.contains("spec_serve_bad"))
    // the evidence still landed on disk (seal-then-raise) and the
    // LOAD path refuses the regressed snapshot too
    val ex2 = intercept[IllegalArgumentException] {
      QuantGate.check(spark, "spec_serve_bad", "/tmp/servegate_spec")
    }
    assert(ex2.getMessage.contains("spec_serve_bad"))
  }

  test("pq and bq composed meters agree with the float walk on the " +
      "healthy fixture") {
    import graft.operators.Pq
    import spark.implicits._
    // 32-d twin of the fixture (Bq packs 32 bits per word): cluster A
    // on axis 0 with per-id jitter on axis 1, cluster B on axis 2
    // with jitter on axis 3
    def vec32(axis: Int, jAxis: Int, j: Float): Seq[Float] =
      Seq.tabulate(32)(i =>
        if (i == axis) 1f else if (i == jAxis) j else 0f)
    val corpus32 =
      ((1 to 4).map(i => (i.toLong, vec32(0, 1, 0.01f * i))) ++
        (11 to 14).map(i => (i.toLong, vec32(2, 3, 0.01f * (i - 10)))))
        .toDF("vec_id", "embedding")
    val qDf32 = Seq(Tuple1(vec32(0, 1, 0.02f))).toDF("qe")
    // m=2 subspaces of 16 dims, k=2 centers per subspace — enough
    // code space for two clusters; trained on the corpus itself
    val model = Pq.trainCodebooks(corpus32, "vec_id", "embedding",
      m = 2, k = 2, maxIter = 4)
    val q = qDf32.head().getSeq[Float](0).toArray
    val pqR = ServeGate.pqWalkRecall(corpus32, goodGraph,
      entries = Seq(1L, 11L), model, q, qDf32, "vec_id", "embedding",
      beam = 4, rounds = 2, shortlist = 8)
    // shortlist 8 = whole corpus → the exact rerank restores the full
    // answer regardless of code quality
    assert(pqR == 1.0, s"pq composed recall $pqR")
    val bqR = ServeGate.bqWalkRecall(corpus32, goodGraph,
      entries = Seq(1L, 11L), dim = 32, q, qDf32, "vec_id", "embedding",
      beam = 4, rounds = 2, shortlist = 8)
    assert(bqR == 1.0, s"bq composed recall $bqR")
  }
}
