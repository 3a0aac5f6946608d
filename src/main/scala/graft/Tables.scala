package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All operators take DataFrames, never paths — this object is the only
  * place that knows the on-disk layout, so a cluster deployment can swap
  * in partitioned / bucketed variants without touching operator code.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "region")
  /** events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) and
    * TIMESTAMP_NTZ(MICROS) across driver testdata generations, so the
    * reader adapts to what the file actually holds:
    *  - NANOS: Spark's vectorized reader rejects it; read as a nanos
    *    Long (legacy flag) and convert with integer `div`, NOT `/` —
    *    Spark's `/` is double division and epoch nanos (~1.7e18)
    *    exceed a double's 2^53 integer range, so the rounded quotient
    *    can land one microsecond off DuckDB's exact ns→µs conversion.
    *  - NTZ micros: cast to TimestampType; the session runs UTC so the
    *    wall-clock is unchanged and matches DuckDB's read.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
