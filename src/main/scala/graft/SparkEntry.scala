package graft

import graft.queries.{IngestQueries, RelationalQueries, StreamingQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory (one entry per implemented operator, SURVEY.md §2):
  *   v* — vector search surface (the reference's flagship pipeline)
  *   r* — relational operator coverage (TPC-H-ish tables)
  *   t* — text/dedup/multimodal training-data pipeline
  *   i* — ingest path (embed, dedup-ingest, id assignment)
  *   s* — Structured Streaming (batch/stream parity oracles)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's whole
    * read path — embed-free k-NN cosine top-k over the index
    * (reference server.js:217-265). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.knnTopK(spark, "/root/testdata/sf0.001", k = 5)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VectorQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ IngestQueries.queries ++ StreamingQueries.queries

  def oracleSql: Map[String, String] =
    VectorQueries.oracles ++ RelationalQueries.oracles ++
      TextQueries.oracles ++ IngestQueries.oracles ++ StreamingQueries.oracles
}
