package graft.operators

import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space classification — the nearest-class-mean (Rocchio)
  * model that production data pipelines run as quality/domain/topic
  * filters over document embeddings: training is one aggregation over
  * the labeled corpus, the model is |classes| mean vectors (KBs), and
  * scoring is a broadcast argmax — so the filter pass over 100 TB is a
  * narrow map, no shuffle, no per-row model lookup.
  *
  * The reference has no trained component at all (its embedding is an
  * external API call, embed.js:9-31); this is the missing curation
  * stage between embedding and search: label a slice, train, filter
  * the corpus by predicted class.
  */
object Classify {

  /** Per-class mean vector over the training split: posexplode to
    * (label, pos, x), one two-level aggregate (partial map-side sums),
    * re-packed to an array ordered by position. Output
    * (labelCol, centroid float[]) — |classes| rows, artifact-sized.
    */
  def classMeans(train: DataFrame, labelCol: String, vecCol: String)
      : DataFrame =
    train
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(labelCol), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col(labelCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .as("pm"))
      .select(col(labelCol),
        transform(col("pm"), p => p("m").cast("float")).as("centroid"))

  /** Assign every vector the class of its nearest mean by COSINE
    * (ties break to the lower class id — deterministic). The means
    * broadcast; argmin is a map-side-combining min_by, so the exchange
    * moves one row per vector ([[Ann.ivfAssign]]'s shape with cosine
    * in place of L2).
    */
  /** Argmax with the model carried AS A LITERAL (the [[Pq]] kernel
    * convention: a KB-scale trained model rides in the serialized
    * expression, the moral equivalent of a broadcast). A pure narrow
    * projection — no join, no aggregate, no state — which makes it
    * STREAMING-LEGAL: continuous scoring of an embedding stream is
    * this exact column over `readStream`. Ties break to the lower
    * class id (array_min orders the (−cos, cls) struct
    * lexicographically), matching [[nearestClassAssign]].
    */
  def nearestClassLit(vec: org.apache.spark.sql.Column,
                      means: Seq[(Long, Array[Float])])
      : org.apache.spark.sql.Column = {
    require(means.nonEmpty, "nearestClassLit needs a non-empty model")
    array_min(array(means.map { case (c, m) =>
      struct(negate(cosineSim(vec, lit(m))).as("negcos"),
        lit(c).as("cls"))
    }: _*)).getField("cls")
  }

  def nearestClassAssign(emb: DataFrame, means: DataFrame,
                         idCol: String, vecCol: String,
                         classCol: String): DataFrame =
    emb.crossJoin(broadcast(means))
      .select(col(idCol), col(vecCol), col(classCol),
        cosineSim(col(vecCol), col("centroid")).as("cos"))
      .groupBy(col(idCol))
      .agg(min_by(
        struct(col(vecCol), col(classCol)),
        struct(negate(col("cos")), col(classCol))).as("best"))
      .select(col(idCol), col(s"best.$vecCol").as(vecCol),
        col(s"best.$classCol").as("pred"))
}
