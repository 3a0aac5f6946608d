package graft.operators

import graft.functions.TextFunctions.words
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window word chunker — the reference's `chunkText` /
  * `processTextFile` (reference embed.js:183-207): split on whitespace,
  * emit windows of `chunkSize` words advancing by `chunkSize - overlap`,
  * at least one chunk per document (reference always emits the first
  * window, even for short/empty docs).
  *
  * Number of chunks for w words: 1 + ceil(max(0, w - chunkSize) / stride).
  *
  * Implemented as pure column expressions (`sequence`/`transform`/`slice`/
  * `array_join` + `explode`) so it is whole-stage-codegen'd and
  * SQL-oracle-expressible; a narrow map with no shuffle, which is what
  * lets it stream over 100 TB of documents unchanged.
  */
object Chunker {

  /** Array-of-chunks column for one text column. */
  def chunksOf(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got $chunkSize/$overlap")
    val stride = chunkSize - overlap
    val ws = words(text)
    val nChunks =
      lit(1) + ceil(greatest(size(ws) - chunkSize, lit(0)).cast("double") / stride)
        .cast("int")
    transform(
      sequence(lit(0), nChunks - 1),
      i => array_join(slice(ws, i * stride + 1, lit(chunkSize)), " "))
  }

  /** Explode `textCol` of `df` into one row per chunk, keeping all other
    * columns and adding (chunk_ix, chunk, chunk_words).
    */
  def chunk(df: DataFrame, textCol: String, chunkSize: Int, overlap: Int)
      : DataFrame =
    df.select(
        col("*"),
        posexplode(chunksOf(col(textCol), chunkSize, overlap))
          .as(Seq("chunk_ix", "chunk")))
      .withColumn("chunk_words", size(words(col("chunk"))))
}
