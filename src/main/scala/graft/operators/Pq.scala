package graft.operators

import graft.expressions.{PqAdcDistance, PqEncode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split each vector into `m`
  * subvectors, vector-quantize each subspace against its own small
  * codebook (k centroids, one byte-ish code per subspace), and answer
  * queries with ASYMMETRIC distance — the query stays exact, each
  * stored vector is represented by its codes, and per-candidate
  * distance is m table lookups into a per-query LUT.
  *
  * Why it matters at 100 TB: a 64-dim float32 embedding is 256 B; its
  * PQ codes at m=8 are 8 SMALL ints — a 30×+ index-memory cut that
  * composes with IVF cell routing ([[Ann]]) into the classic IVF-PQ
  * layout. The reference holds raw vectors in a JS array
  * (server.js:37-43) — this is the path that replaces it at scale.
  *
  * The codebooks are m×k×(dim/m) floats — a few KiB — trained with
  * seeded MLlib k-means per subspace and carried driver-side into two
  * kernel expressions (encode, ADC distance); both ship to executors as
  * part of the serialized expression, the moral equivalent of a
  * broadcast of a tiny model.
  */
object Pq {

  /** codebooks(j)(c) = centroid c of subspace j, length dim/m. */
  case class PqModel(dsub: Int, codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks(0).length
  }

  /** Train per-subspace codebooks. Deterministic: fixed seed and the
    * pinned-layout k-means of [[Ann.kmeansCentroids]]'s recipe (the
    * input is hash-repartitioned inside MLlib fitting via the slice
    * frames below).
    */
  def trainCodebooks(emb: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, maxIter: Int = 8,
                     seed: Long = 42L): PqModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val books = (0 until m).map { j =>
      val sliced = emb.select(col(idCol),
          array_to_vector(slice(col(vecCol), j * dsub + 1, dsub)
            .cast("array<double>")).as("features"))
        .repartition(8, col(idCol))
      val model = new KMeans()
        .setK(k).setSeed(seed + j).setMaxIter(maxIter)
        .setFeaturesCol("features")
        .fit(sliced)
      model.clusterCenters.map(_.toArray.map(_.toFloat))
    }.toArray
    PqModel(dsub, books)
  }

  /** (idCol, codes) — codes(j) = argmin_c L2(subvector_j, codebook_j_c),
    * ties to the lower code. One narrow kernel pass, no shuffle.
    */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             model: PqModel): DataFrame =
    emb.select(col(idCol),
      Bridge.column(PqEncode(Bridge.expression(col(vecCol)),
        model.dsub, model.codebooks)).as("codes"))

  /** Approximate squared-L2 distance of every encoded vector to `query`
    * via the per-query lookup table: LUT(j)(c) = ||query_j − book_j_c||²,
    * per-row cost = m lookups. The query is a plain vector (endpoint
    * semantics — same as the reference's one query per request,
    * server.js:218); the LUT is computed once here, driver-side, and
    * ships inside the expression.
    */
  def adcDistance(codesCol: Column, query: Array[Float],
                  model: PqModel): Column = {
    require(query.length == model.m * model.dsub,
      s"query dim ${query.length} != ${model.m}×${model.dsub}")
    val lut = Array.tabulate(model.m, model.k) { (j, c) =>
      var acc = 0.0
      var i = 0
      while (i < model.dsub) {
        val d = query(j * model.dsub + i) - model.codebooks(j)(c)(i)
        acc += d * d
        i += 1
      }
      acc.toFloat
    }
    Bridge.column(PqAdcDistance(Bridge.expression(codesCol), lut))
  }

  /** Top-k nearest by PQ asymmetric distance (ascending, ties to lower
    * id) — TakeOrderedAndProject over a narrow scan of the code table.
    */
  def search(encoded: DataFrame, idCol: String, query: Array[Float],
             model: PqModel, k: Int): DataFrame =
    encoded.select(col(idCol),
        adcDistance(col("codes"), query, model).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol))
      .limit(k)

  /** The production PQ shape: ADC shortlist of `shortlist` candidates
    * from the compressed codes, then EXACT re-rank of just those
    * against the raw vectors (fetched by broadcast semi-join — only the
    * shortlist's full vectors are ever touched). Recovers most of the
    * recall PQ compression loses while still scanning codes, not
    * floats.
    */
  def searchRerank(encoded: DataFrame, raw: DataFrame, idCol: String,
                   vecCol: String, query: Array[Float], model: PqModel,
                   shortlist: Int, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.l2Dist
    val cands = search(encoded, idCol, query, model, shortlist)
      .select(idCol)
    val qLit = array(query.map(x => lit(x)).toIndexedSeq: _*)
    raw.join(broadcast(cands), Seq(idCol))
      .select(col(idCol), l2Dist(col(vecCol), qLit).as("dist"))
      .orderBy(col("dist").asc, col(idCol))
      .limit(k)
  }
}
