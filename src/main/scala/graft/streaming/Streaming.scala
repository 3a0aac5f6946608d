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
      // integer div, not `/`: epoch nanos exceed a double's exact range
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  /** Same as [[runAvailableNow]] but update output — for
    * mapGroupsWithState, which emits one refreshed row per touched group
    * per micro-batch. */
  def runAvailableNowUpdate(spark: SparkSession, rows: DataFrame,
                            queryName: String): DataFrame = {
    val q = rows.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  case class SessEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessState(lastTs: Long, sessions: Long, events: Long)
  case class SessOut(user_id: Long, n_sessions: Long, n_events: Long)

  /** Custom-state sessionization with `mapGroupsWithState`: a session
    * ends after a >30 min silence per user (same contract as the batch
    * lag/cumsum formulation). State per user is 24 bytes (last event
    * second, session & event counts) — the KeyValueGroupedDataset path
    * for logic that windows/aggregations can't express.
    *
    * Events are sorted within each micro-batch delivery; state carries
    * the last timestamp so session boundaries survive batch splits (with
    * the usual streaming caveat that late cross-batch arrivals belong in
    * front of the watermark, which a finite AvailableNow drain
    * satisfies trivially).
    */
  def sessionCounts(events: DataFrame)
      : org.apache.spark.sql.Dataset[SessOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id"), col("ts"), col("event_id"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessState, SessOut](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[SessEvent], state) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var (lastTs, sessions, count) = state.getOption
            .map(s => (s.lastTs, s.sessions, s.events))
            .getOrElse((Long.MinValue, 0L, 0L))
          for (e <- sorted) {
            val t = e.ts.getTime / 1000
            if (lastTs == Long.MinValue || t - lastTs > 1800) sessions += 1
            lastTs = t
            count += 1
          }
          state.update(SessState(lastTs, sessions, count))
          SessOut(uid, sessions, count)
      }
  }
}
