package graft.operators

import graft.functions.HashFunctions.md5Long
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns plus a typed metadata struct —
  * the layout used by large-scale multimodal training pipelines (and by
  * Spark's own `binaryFile` source).
  *
  * The actual media decode is STUBBED (this container ships no image/
  * audio codecs): [[decodeStub]] derives deterministic fake metadata from
  * the bytes. Everything around the stub — schema, batch shape,
  * partition-friendly narrow projection, feature extraction signature —
  * is the real plumbing a codec UDF would drop into.
  */
object Multimodal {

  /** Wrap a text table as a fake media table: payload = utf-8 bytes.
    * In production this column comes from `spark.read.format("binaryFile")`
    * or pre-packed parquet/webdataset shards.
    */
  def asBinaryPayload(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"))

  /** STUB decoder: a real implementation would parse the container
    * header (JPEG/PNG/WAV...) here. The fake is a pure function of the
    * payload so tests and oracles stay deterministic: dimensions and
    * sample rate are carved out of the md5 of the bytes.
    */
  def decodeStub(df: DataFrame): DataFrame = {
    val h = md5Long(col("payload").cast("string"))
    df
      .withColumn("byte_len", octet_length(col("payload")))
      .withColumn("meta", struct(
        (pmod(h, lit(1280)) + 1).cast("int").as("width"),
        (pmod(shiftright(h, 16), lit(720)) + 1).cast("int").as("height"),
        element_at(
          array(lit("jpeg"), lit("png"), lit("webp"), lit("wav")),
          (pmod(shiftright(h, 32), lit(4)) + 1).cast("int")).as("format")))
  }

  /** STUB feature extractor: stands in for resize / frame-sample /
    * mel-spectrogram. Emits a fixed-length feature vector derived from
    * byte statistics — the signature (binary → array<float>) is what a
    * real kernel would keep.
    */
  def featureStub(df: DataFrame, dim: Int): DataFrame =
    df.withColumn("features",
      transform(sequence(lit(0), lit(dim - 1)), i =>
        (pmod(md5Long(concat(col("payload").cast("string"), lit(":"),
          i.cast("string"))), lit(1000)).cast("double") / 1000.0)
          .cast("float")))
}
