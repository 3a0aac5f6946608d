package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session — Spark
  * startup costs ~5s, so suites must not each build their own).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // see Bench.scala: injected runtime blooms off (checkpoint
      // frames' unknown stats defeat the thresholds)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  import scala.jdk.CollectionConverters._

  def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  def vecsDf(rows: (Long, Seq[Float])*): DataFrame = {
    import spark.implicits._
    rows.toSeq.map { case (id, v) => (id, v.toArray) }
      .toDF("vec_id", "embedding")
  }
}
