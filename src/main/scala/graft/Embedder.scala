package graft

import org.apache.spark.sql.DataFrame

/** The EMBEDDING SEAM — the one constructor point where a deployment
  * swaps the engine's deterministic hash embedder for a real model
  * call (the reference's OpenAI `text-embedding-ada-002` flow,
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

/** EXAMPLE network-backed embedder — the batched-RPC implementation
  * the [[Embedder]] doc describes, shipped so a user wiring the
  * reference's actual OpenAI flow (embed.js:135-151) starts from
  * working plumbing instead of the doc note alone.
  *
  * Shape (the part that transfers to any provider): `mapPartitions`
  * over the rows, ONE HTTP client per partition (connection reuse —
  * never a client per row), texts grouped into `batchSize`-sized
  * requests (the reference batches 20 chunks per OpenAI call,
  * embed.js:187-195), strict response validation (a short or
  * misaligned response FAILS the task — Spark retries it — rather
  * than silently mis-pairing vectors with rows).
  *
  * Wire protocol (deliberately minimal, dependency-free): POST to
  * `endpoint`; request body = one Base64(UTF-8 text) per line
  * (Base64 because texts may contain newlines); response = one
  * embedding per line, comma-separated decimal floats, same order.
  * A production impl swaps exactly two code points — the request
  * encoding and the response parsing — for the provider's JSON;
  * everything else (batching, per-partition client, validation,
  * schema handling) carries over unchanged.
  *
  * Determinism caveat from the [[Embedder]] contract applies in
  * full: the server must be pinned to one model version per store
  * lifetime. Tested against a local in-process mock server
  * (HttpEmbedderSpec) — zero egress.
  */
final class HttpEmbedder(endpoint: String, batchSize: Int = 20)
    extends Embedder {
  require(batchSize >= 1, s"batchSize=$batchSize must be >= 1")

  override def embed(df: DataFrame, textCol: String, dim: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val outSchema =
      df.schema.add("embedding", ArrayType(FloatType, containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    val (url, bs) = (endpoint, batchSize)
    df.mapPartitions { rows =>
      // one client per PARTITION (the codec-handle convention): HTTP
      // connection reuse across this partition's batches
      val client = java.net.http.HttpClient.newHttpClient()
      val uri = java.net.URI.create(url)
      rows.grouped(bs).flatMap { batch =>
        val body = batch.iterator
          .map(r => java.util.Base64.getEncoder
            .encodeToString(r.getString(textIdx).getBytes("UTF-8")))
          .mkString("\n")
        val req = java.net.http.HttpRequest.newBuilder(uri)
          .header("Content-Type", "text/plain")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"embedder endpoint returned HTTP ${resp.statusCode()}")
        val vecs = resp.body().split("\n", -1).iterator
          .filter(_.nonEmpty)
          .map(line => line.split(",").map(_.toFloat).toSeq)
          .toIndexedSeq
        // misalignment must fail loudly: a silent zip would pair
        // vectors with the wrong rows for the store's lifetime
        require(vecs.size == batch.size,
          s"embedder returned ${vecs.size} vectors for ${batch.size} texts")
        require(vecs.forall(_.length == dim),
          s"embedder returned dims ${vecs.map(_.length).distinct} != $dim")
        batch.iterator.zip(vecs.iterator)
          .map { case (r, v) => Row.fromSeq(r.toSeq :+ v) }
      }
    }(Encoders.row(outSchema))
  }
}
