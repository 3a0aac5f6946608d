package graft

import org.apache.spark.sql.DataFrame

/** The EMBEDDING SEAM — the one constructor point where a deployment
  * swaps the engine's deterministic hash embedder for a real model
  * call (the reference's OpenAI `text-embedding-3-small` flow,
  * embed.js:135-151, is exactly this shape: text in, float vector
  * out).
  *
  * Contract: append an `embedding` column — `array<float>`, length
  * `dim`, L2-normalized if cosine scores should be comparable across
  * embedders — to `df`, derived from `textCol` only. The engine calls
  * it on the ingest path (chunk texts) and on every query path (query
  * strings), so the SAME embedder serves both — mixing embedders
  * between store and query is the classic silent-garbage failure mode
  * and the single-seam design makes it unrepresentable.
  *
  * A network-backed implementation typically batches per partition
  * (`mapPartitions` over an iterator of texts → one RPC per batch) and
  * must stay DETERMINISTIC per text within a store's lifetime: the
  * dedup-ingest path compares content, not vectors, so re-embedding
  * drift never duplicates rows, but search quality silently degrades
  * if stored and query vectors come from different model versions —
  * version the store when the model changes.
  *
  * The default, [[HashEmbedder]], is the verified zero-egress
  * stand-in: every oracle-gated query and spec runs against it.
  */
trait Embedder extends Serializable {
  def embed(df: DataFrame, textCol: String, dim: Int): DataFrame
}

/** Deterministic default: token → md5 bucket, signed, L2-normalized
  * ([[graft.expressions.HashEmbed]]) — bit-reproducible anywhere md5
  * exists, which is what lets DuckDB oracles replay engine results.
  */
object HashEmbedder extends Embedder {
  override def embed(df: DataFrame, textCol: String, dim: Int): DataFrame =
    graft.operators.Ingest.hashEmbed(df, textCol, dim)
}
