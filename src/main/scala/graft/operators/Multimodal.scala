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

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class DecodedRow(doc_id: Long, byte_len: Int, width: Int,
                        height: Int, format: String,
                        features: Array[Float])

  /** Batch-shaped decode+extract: the Scala analog of a pandas-UDF
    * `mapInPandas` media pipeline. One CODEC handle per PARTITION (real
    * decoders — libjpeg, ffmpeg contexts — are expensive to init and not
    * serializable, so they must be constructed inside mapPartitions, not
    * per row and not on the driver), then a streaming iterator over the
    * partition's rows. The stub codec derives deterministic metadata +
    * features from the bytes; a real decoder drops into `Codec` without
    * touching the plumbing.
    */
  def decodeBatch(df: DataFrame, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition "codec" init happens HERE, once
        val codec = new StubCodec(dim)
        rows.map { r =>
          val m = codec.decode(r.payload)
          DecodedRow(r.doc_id, r.payload.length, m.width, m.height,
            m.format, codec.features(r.payload))
        }
      }
      .toDF()
  }

  /** Deterministic stand-in for a native media codec. Holds the mutable
    * scratch state a real decoder would (buffers, contexts) — hence one
    * instance per partition.
    */
  final class StubCodec(dim: Int) {
    private val digest = java.security.MessageDigest.getInstance("MD5")

    case class Meta(width: Int, height: Int, format: String)

    private def h60(bytes: Array[Byte], salt: String): Long = {
      digest.reset()
      digest.update(bytes)
      digest.update(salt.getBytes("UTF-8"))
      val h = digest.digest()
      var acc = 0L
      var i = 0
      while (i < 7) { acc = (acc << 8) | (h(i) & 0xffL); i += 1 }
      (acc << 4) | ((h(7) & 0xf0L) >> 4)
    }

    private val formats = Array("jpeg", "png", "webp", "wav")

    def decode(payload: Array[Byte]): Meta = {
      val h = h60(payload, "")
      Meta((h % 1280 + 1).toInt, ((h >> 16) % 720 + 1).toInt,
        formats(((h >> 32) % 4).toInt))
    }

    def features(payload: Array[Byte]): Array[Float] =
      Array.tabulate(dim)(i =>
        (h60(payload, s":$i") % 1000).toFloat / 1000.0f)
  }
}
