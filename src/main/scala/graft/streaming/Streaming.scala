package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface. The reference has no streams at all
  * (request/response HTTP; SURVEY.md §2.2) — this is the scale path for
  * continuous ingest: the same declarative transforms run incrementally
  * with watermark-bounded state.
  *
  * Everything here uses `Trigger.AvailableNow` + a memory sink so runs
  * are finite and deterministic (batch/stream parity is asserted by the
  * oracle: the streaming result must hash-match the batch SQL).
  */
object Streaming {

  /** File stream over the driver's events parquet (TIMESTAMP(NANOS) —
    * read as nanos Long, converted like [[graft.Tables.events]]).
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
  }

  /** Run a finite (available-now) streaming aggregation to a memory
    * sink and return the result table. `complete` output keeps the full
    * aggregate, so the result equals the batch computation.
    */
  def runAvailableNow(spark: SparkSession, aggregated: DataFrame,
                      queryName: String): DataFrame = {
    val q = aggregated.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Same as [[runAvailableNow]] but append output — for stateful
    * row-level operators (dedup) whose results accrete rather than
    * update. */
  def runAvailableNowAppend(spark: SparkSession, rows: DataFrame,
                            queryName: String): DataFrame = {
    val q = rows.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Hourly per-type event counts as a watermarked windowed streaming
    * aggregation — the streaming twin of the batch hourly rollup. State
    * is bounded by the 1h watermark at production scale; with
    * AvailableNow over a finite source it drains to the exact batch
    * answer.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("n"), sum("value").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup on a key column: `dropDuplicates` keeps
    * first-seen per key across micro-batches (state-backed) — the
    * streaming twin of the reference's INSERT OR IGNORE (reference
    * server.js:198).
    */
  def streamingDedup(stream: DataFrame, keyCol: String): DataFrame =
    stream.dropDuplicates(keyCol)
}
