package graft

import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Batch/stream parity on tiny local parquet fixtures: the streaming
  * plans must drain (AvailableNow) to exactly the batch answers.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_stream").toString
    Seq(
      ("2024-01-01 10:05:00", "click", 1.0),
      ("2024-01-01 10:55:00", "click", 2.0),
      ("2024-01-01 11:05:00", "view", 3.0),
      ("2024-01-01 12:20:00", "click", 4.0))
      .toDF("ts_s", "event_type", "value")
      .select(to_timestamp(col("ts_s")).as("ts"), col("event_type"),
        col("value"))
      .write.mode("overwrite").parquet(s"$d/events")
    d
  }

  private def stream = {
    val schema = spark.read.parquet(s"$dir/events").schema
    spark.readStream.schema(schema).parquet(s"$dir/events")
  }

  test("windowed hourly aggregation drains to the batch answer") {
    val got = Streaming.runAvailableNow(spark,
        Streaming.hourlyCounts(stream), "graft_test_hourly")
      .orderBy("hour", "event_type")
      .select("hour", "event_type", "n", "sum_value")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01 10:00", "click", 2L, 3.0),
      ("2024-01-01 11:00", "view", 1L, 3.0),
      ("2024-01-01 12:00", "click", 1L, 4.0)))
  }

  test("streaming dropDuplicates keeps one row per key") {
    val got = Streaming.runAvailableNowAppend(spark,
        Streaming.streamingDedup(stream, "event_type").select("event_type"),
        "graft_test_dedup")
      .as[String].collect().toSeq.sorted
    assert(got == Seq("click", "view"))
  }

  test("mapGroupsWithState sessionization matches the batch lag/cumsum") {
    val d = Files.createTempDirectory("graft_sess").toString
    Seq(
      (1L, "2024-01-01 10:00:00", 1L), // u1 s1
      (1L, "2024-01-01 10:10:00", 2L), // u1 s1 (10 min gap)
      (1L, "2024-01-01 11:00:00", 3L), // u1 s2 (50 min gap)
      (2L, "2024-01-01 09:00:00", 4L), // u2 s1
      (2L, "2024-01-01 09:30:00", 5L), // u2 s1 (exactly 30 min → same)
      (2L, "2024-01-01 10:00:01", 6L)) // u2 s2 (30m01s > 30m)
      .toDF("user_id", "ts_s", "event_id")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_id"))
      .write.mode("overwrite").parquet(s"$d/ev")
    val schema = spark.read.parquet(s"$d/ev").schema
    val stream = spark.readStream.schema(schema).parquet(s"$d/ev")
    val got = Streaming.runAvailableNowUpdate(spark,
        Streaming.sessionCounts(stream).toDF(), "graft_test_sessions")
      .orderBy("user_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L), (2L, 2L, 3L)))
  }

  test("watermark drops late data in append-mode windowed aggregation") {
    val d = Files.createTempDirectory("graft_late").toString
    val chk = Files.createTempDirectory("graft_late_chk").toString
    val out = Files.createTempDirectory("graft_late_out").toString + "/agg"
    def writeBatch(rows: Seq[(String, Double)], mode: String): Unit =
      rows.toDF("ts_s", "value")
        .select(to_timestamp(col("ts_s")).as("ts"), col("value"))
        .write.mode(mode).parquet(s"$d/ev")
    def drain(): Unit = {
      // memory sink can't recover a checkpoint → durable parquet sink
      val schema = spark.read.parquet(s"$d/ev").schema
      val q = spark.readStream.schema(schema).parquet(s"$d/ev")
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count("*").as("n"))
        .select(date_format(col("window.start"), "HH:mm").as("h"), col("n"))
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append") // append emits a window only once it closes
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1 advances the watermark far past the 10:00 window
    writeBatch(Seq(("2024-01-01 10:05:00", 1.0), ("2024-01-01 10:20:00", 1.0),
      ("2024-01-01 13:00:00", 1.0)), "overwrite")
    drain()
    // batch 2: a late event for the long-closed 10:00 window + one live
    writeBatch(Seq(("2024-01-01 10:30:00", 9.9), ("2024-01-01 14:00:00", 1.0)),
      "append")
    drain()
    val got = spark.read.parquet(out).orderBy("h")
      .as[(String, Long)].collect().toMap
    // 10:00 window emitted with ONLY the 2 on-time events; late row gone
    assert(got("10:00") == 2L, s"late event leaked into $got")
    assert(!got.contains("14:00"), "unclosed window must not be emitted yet")
  }

  test("file-stream ingest appends new files incrementally") {
    val out = Files.createTempDirectory("graft_stream_out").toString
    val chk = Files.createTempDirectory("graft_stream_chk").toString
    def runOnce(): Unit = {
      val q = stream.writeStream
        .format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(s"$out/data").count() == 4)
    // a second drain with no new files adds nothing (exactly-once)
    runOnce()
    assert(spark.read.parquet(s"$out/data").count() == 4)
    // new file arrives → only its rows are appended
    Seq(("2024-01-01 13:00:00", "click", 5.0)).toDF("ts_s", "event_type", "value")
      .select(to_timestamp(col("ts_s")).as("ts"), col("event_type"), col("value"))
      .write.mode("append").parquet(s"$dir/events")
    runOnce()
    assert(spark.read.parquet(s"$out/data").count() == 5)
  }
}
