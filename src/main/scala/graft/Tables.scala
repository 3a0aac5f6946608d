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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a nanos Long (legacy flag) and convert
    * to a microsecond TimestampType column. Integer `div`, NOT `/`:
    * Spark's `/` is double division, and epoch nanos (~1.7e18) exceed
    * a double's 2^53 integer range — the rounded quotient can land one
    * microsecond off DuckDB's exact ns→µs conversion.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
