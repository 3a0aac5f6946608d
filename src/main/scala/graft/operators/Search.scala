package graft.operators

import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-NN search pipeline — the reference's flagship read path
  * (reference server.js:217-265): score every indexed vector against the
  * query (exact brute force, server.js:45-61), keep the top k
  * (server.js:58-60), join back to contents (server.js:231-248), build
  * the enumerated context string (server.js:251-254).
  *
  * Scale shape: the query side is always tiny → broadcast; scoring is a
  * narrow codegen'd projection over the index (arbitrarily partitionable);
  * global top-k plans as TakeOrderedAndProject (per-partition heap +
  * driver merge of k·P rows — no shuffle of the scored set); batched
  * search keeps one shuffle, keyed by query id.
  */
object Search {

  /** Score each row of `index` (columns: idCol, vecCol) against every row
    * of the (tiny) `queries` frame (columns: queryIdCol, queryVecCol).
    * Broadcast nested-loop join: |index| × |queries| scored rows, never a
    * shuffle of the index side.
    */
  def scoreAll(index: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String,
               queryIdCol: String, queryVecCol: String): DataFrame =
    index.crossJoin(broadcast(queries))
      .select(
        col(queryIdCol),
        col(idCol),
        cosineSim(col(vecCol), col(queryVecCol)).as("score"))

  /** Exact global top-k for a single query vector taken from `queries`.
    * Ties break on ascending id (the reference's sort is unstable —
    * server.js:58-60; we pin determinism per SURVEY.md §7.4).
    */
  def topK(index: DataFrame, query: DataFrame,
           idCol: String, vecCol: String, queryVecCol: String,
           k: Int): DataFrame =
    index.crossJoin(broadcast(query))
      .select(col(idCol), cosineSim(col(vecCol), col(queryVecCol)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Batched search: per-query top-k via ranking window. One shuffle,
    * keyed by query id; at 100 TB the scored set never materializes —
    * AQE sizes the single exchange.
    */
  def topKPerQuery(scored: DataFrame, queryIdCol: String, idCol: String,
                   k: Int): DataFrame = {
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Enrich hits with document content — broadcast the (tiny) hit set
    * into the corpus join. Inner join: a broadcast hash join cannot
    * build the broadcast side of an outer join that preserves it (the
    * right-outer formulation silently shuffles the whole corpus), and
    * hits always exist in the store they were scored from; the
    * reference's null-content case (server.js:245-252) is filtered
    * immediately afterwards anyway.
    */
  def enrich(hits: DataFrame, docs: DataFrame, idCol: String): DataFrame =
    docs.join(broadcast(hits), Seq(idCol))

  /** The reference's context builder (server.js:251-254): rank hits by
    * score, enumerate "i. content", newline-join to a single string.
    * Returns one row per query id.
    */
  def contextAgg(enriched: DataFrame, queryIdCol: String, idCol: String,
                 contentCol: String): DataFrame = {
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol))
    enriched
      .filter(col(contentCol).isNotNull)
      .withColumn("rank", row_number().over(w))
      .withColumn("line", concat(col("rank"), lit(". "), col(contentCol)))
      .groupBy(col(queryIdCol))
      .agg(concat_ws("\n",
        array_sort(collect_list(struct(col("rank"), col("line"))))
          .getField("line")).as("context"))
  }
}
