package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink surface beyond the driver's parquet tables.
  *
  * Reference coverage: the documents-directory scan (O1, reference
  * server.js:161-190), the CSV sink (O20, embed.js:106-127); CSV/JSON
  * reads are free Spark capability (SURVEY.md §2.2).
  */
object Sources {

  /** Whole-file directory scan — one row per file, like the reference's
    * readdir + readFile loop (server.js:165-170), but distributed:
    * (source, text) with source = file name.
    */
  def textDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("source"),
        col("value").as("text"))

  /** CSV sink (header, like embed.js:108-114) + source. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** JSON-lines sink + source. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
