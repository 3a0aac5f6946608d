package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** r18 optimization-round evidence dumper: `explain("formatted")` of
  * each touched query's returned frame, one file per query, for the
  * committed plans/r18/<query>_{before,after}.txt pairs. Run:
  *   sbt "runMain graft.PlanProbeR18 <outDir> <suffix> [sfDir] [names...]"
  */
object PlanProbeR18 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val names = if (args.length > 3) args.drop(3).toSeq else Seq(
      "v74_prefix_rotated", "v77_prefix_sq8", "v78_neardup_tier_lsm",
      "v79_neardup_tau_sweep", "v80_prefix_sq8_lsm", "s18_stream_dsir",
      "s27_stream_graph_lsm", "v69_occupancy_geometry",
      "v71_occupancy_drift", "v72_hist_fold_drift", "v73_drift_serve",
      "v75_neardup_tier", "v76_neardup_serve")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).trim + "\n")
        println(s"[plans] $name ok")
      } catch { case e: Throwable =>
        println(s"[plans] $name FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
