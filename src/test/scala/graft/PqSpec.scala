package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // two clean clusters per 2-dim subspace (dim 4, m=2): every vector is
  // near one of 4 "prototype" combinations
  private def emb = vecsDf(
    (1L, Seq(10f, 0f, 0f, 10f)), (2L, Seq(10f, 0f, 10f, 0f)),
    (3L, Seq(0f, 10f, 0f, 10f)), (4L, Seq(0f, 10f, 10f, 0f)),
    (5L, Seq(10.5f, 0f, 0f, 9.5f)), (6L, Seq(9.5f, 0.5f, 10.2f, 0f)),
    (7L, Seq(0f, 10.5f, 0.3f, 9.8f)), (8L, Seq(0.4f, 9.7f, 9.9f, 0.2f)))

  private lazy val model =
    Pq.trainCodebooks(emb, "vec_id", "embedding", m = 2, k = 2)

  test("trainCodebooks: shape and determinism") {
    assert(model.m == 2 && model.k == 2 && model.dsub == 2)
    val again = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 2, k = 2)
    assert(model.codebooks.flatten.flatten.toSeq ==
      again.codebooks.flatten.flatten.toSeq)
  }

  test("encode: codes in range; near-identical vectors share codes") {
    val codes = Pq.encode(emb, "vec_id", "embedding", model)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(_.forall(c => c >= 0 && c < 2)))
    assert(codes(1L) == codes(5L), "same-cluster vectors must share codes")
    assert(codes(2L) == codes(6L))
    assert(codes(1L) != codes(4L), "opposite clusters must differ")
  }

  test("ADC search: query recovers its own cluster, near-zero distance") {
    val encoded = Pq.encode(emb, "vec_id", "embedding", model)
    val top = Pq.search(encoded, "vec_id", Array(10f, 0f, 0f, 10f),
        model, 2)
      .as[(Long, Double)].collect()
    assert(Set(top(0)._1, top(1)._1) == Set(1L, 5L), top.mkString(","))
    // distance to the reconstructed prototype is tiny on a clean cluster
    assert(top(0)._2 < 1.5, s"adc distance too large: ${top(0)._2}")
  }

  test("PQ recall is 1.0 on cleanly clustered data") {
    import graft.functions.VectorFunctions.l2Dist
    val q = Array(0f, 10f, 10f, 0f)
    val encoded = Pq.encode(emb, "vec_id", "embedding", model)
    val pq = Pq.search(encoded, "vec_id", q, model, 2)
      .select("vec_id").as[Long].collect().toSet
    val qdf = Seq(Tuple1(q)).toDF("qe")
    val exact = emb.crossJoin(qdf)
      .select(col("vec_id"), l2Dist(col("embedding"), col("qe")).as("d"))
      .orderBy(col("d").asc, col("vec_id")).limit(2)
      .select("vec_id").as[Long].collect().toSet
    assert(pq == exact, s"pq=$pq exact=$exact")
  }

  test("rerank equals exact search when the shortlist covers the corpus") {
    import graft.functions.VectorFunctions.l2Dist
    val q = Array(9.8f, 0.3f, 9.9f, 0.1f)
    val encoded = Pq.encode(emb, "vec_id", "embedding", model)
    val reranked = Pq.searchRerank(encoded, emb, "vec_id", "embedding",
        q, model, shortlist = 8, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    val qdf = Seq(Tuple1(q)).toDF("qe")
    val exact = emb.crossJoin(qdf)
      .select(col("vec_id"), l2Dist(col("embedding"), col("qe")).as("d"))
      .orderBy(col("d").asc, col("vec_id")).limit(3)
      .select("vec_id").as[Long].collect().toSeq
    assert(reranked == exact)
  }

  test("IVF-PQ: full probe + full shortlist equals exact; cells prune") {
    import graft.functions.VectorFunctions.l2Dist
    import graft.operators.Ann
    val centroids = Ann.kmeansCentroids(emb, "vec_id", "embedding", 2)
    val index = Pq.buildIvfPqIndex(emb, centroids, "vec_id", "embedding",
      model)
    val q = Array(10f, 0f, 10f, 0f)
    // all cells + all candidates: must equal the exact scan
    val full = Pq.ivfPqSearch(index, centroids, emb, "vec_id",
        "embedding", q, model, nProbe = 2, shortlist = 8, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    val qdf = Seq(Tuple1(q)).toDF("qe")
    val exact = emb.crossJoin(qdf)
      .select(col("vec_id"), l2Dist(col("embedding"), col("qe")).as("d"))
      .orderBy(col("d").asc, col("vec_id")).limit(3)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == exact)
    // nProbe=1 must surface ONLY the query's own (nearest) cell — the
    // cell of vec_id 2, whose embedding equals q exactly; a reversed
    // probe ordering would surface the wrong cell
    val probed1 = Pq.ivfPqSearch(index, centroids, emb, "vec_id",
        "embedding", q, model, nProbe = 1, shortlist = 8, k = 8)
      .select("vec_id").as[Long].collect().toSet
    val ownCell = Ann.ivfAssign(emb, centroids, "vec_id", "embedding")
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(probed1.map(ownCell) == Set(ownCell(2L)),
      s"nProbe=1 must probe exactly the query's nearest cell: $probed1")
    assert(probed1.contains(2L), "the exact match must be in its cell")
  }

  test("batched serving ≡ the single-query path, per query") {
    import graft.operators.Ann
    val centroids = Ann.kmeansCentroids(emb, "vec_id", "embedding", 2)
    val index = Pq.buildIvfPqIndex(emb, centroids, "vec_id", "embedding",
      model)
    val qs = Seq(
      100L -> Array(10f, 0f, 10f, 0f),
      101L -> Array(0f, 10f, 0f, 10f),
      102L -> Array(9.8f, 0.2f, 0.1f, 9.9f))
    val batched = Pq.ivfPqSearchBatch(index, centroids, emb, "vec_id",
        "embedding", qs, model, nProbe = 1, shortlist = 4, k = 3)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3)).sortBy(_._1).toSeq).toMap
    for ((qid, qv) <- qs) {
      val single = Pq.ivfPqSearch(index, centroids, emb, "vec_id",
          "embedding", qv, model, nProbe = 1, shortlist = 4, k = 3)
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
      assert(batched(qid) == single,
        s"query $qid: batch ${batched(qid)} != single $single")
    }
    assert(batched.keySet == qs.map(_._1).toSet)
  }

  test("residuals: center + residual reconstructs the original; a " +
    "vector that IS a centroid has zero residual") {
    val res = Pq.residuals(emb, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val codes = Pq.encode(emb, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val orig = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for (id <- orig.keys) {
      for (i <- 0 until 4) {
        val j = i / model.dsub
        val ctr = model.codebooks(j)(codes(id)(j))(i % model.dsub)
        assert(math.abs(
          res(id)(i) + ctr.toDouble - orig(id)(i).toDouble) < 1e-12,
          s"vec $id dim $i: residual + center != original")
      }
    }
    // the trained centers are cluster means; a residual's norm is
    // bounded by the within-cluster spread, far below the vector norm
    val worst = res.values.map(_.map(x => x * x).sum).max
    assert(worst < 1.0, s"residual energy $worst not small")
  }

  test("two-stage residual coding strictly reduces reconstruction " +
    "error") {
    val res = Pq.residuals(emb, "vec_id", "embedding", model)
    val stage2 = Pq.trainCodebooks(res, "vec_id", "embedding",
      m = 2, k = 2)
    val res2 = Pq.residuals(res, "vec_id", "embedding", stage2)
      .collect().map(_.getSeq[Double](1).map(x => x * x).sum).sum
    val res1 = res.collect()
      .map(_.getSeq[Double](1).map(x => x * x).sum).sum
    assert(res2 < res1, s"stage-2 residual energy $res2 !< $res1")
  }

  test("dimension mismatch raises in encode and adc") {
    val bad = vecsDf((1L, Seq(1f, 2f, 3f)))
    val e = intercept[Exception] {
      Pq.encode(bad, "vec_id", "embedding", model).collect()
    }
    assert(e.getMessage.contains("dim") ||
      e.getCause.getMessage.contains("dim"))
    intercept[IllegalArgumentException] {
      Pq.adcDistance(col("codes"), Array(1f, 2f, 3f), model)
    }
  }
}
