package graft

import graft.operators.Ann
import graft.queries.VectorQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// throwaway: re-measures the 2560x build rung and the near-dup tier
// section on the re-keyed corpus so the SCALING prose numbers can be
// finalized — deleted before commit
object DriftSweepOnly {
  private def time(f: => Long): (Double, Long) = {
    def once: (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val a = once; val b = once
    (math.min(a._1, b._1), b._2)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all0 = VectorQueries.genRefDimCorpus(spark, copies = 2560)
      .persist()
    all0.count(): Unit
    // ---- build rung (v57 sweep, 2560x row) ----
    locally {
      val corpus = all0.filter(col("vec_id") =!= 1000L)
      val nCorpus = corpus.count()
      val occ = Ann.bucketOccupancy(corpus, "embedding", 40, 3, 40)
        .persist()
      val bb = Ann.chooseBucketBits(occ, Ann.DefaultTargetSizeBiased)
      val occRow = occ.filter(col("bucket_bits") === bb).head()
      println(s"BUILD2560: n=$nCorpus bb=$bb max=${occRow.getLong(2)} " +
        s"sb=${occRow.getDouble(3)}")
      occ.unpersist()
      val cand = Ann.knnGraphCandidates(corpus, corpus,
        "vec_id", "embedding", 40, bb,
        Ann.DefaultMaxProbes, Ann.DefaultMaxBucketGroup).count()
      val (tBuild, _) = time {
        Ann.buildKnnGraph(corpus, "vec_id", "embedding",
          bits = 40, bucketBits = bb, degree = 8).count()
      }
      println(f"BUILD2560: cand=$cand candvec=${cand.toDouble / nCorpus}%.0f build=$tBuild%.2f")
    }
    // ---- near-dup tier section ----
    locally {
      val all = all0.filter(col("vec_id") =!= 1000L).persist()
      all.count()
      val reps = Ann.fineBucketNearDupReps(all, "vec_id", "embedding",
        bits = 40, fineBits = 40, tau = 0.8)
      val collapsed = all.join(
        reps.filter(col("rep_id") === col("vec_id")).select("vec_id"),
        Seq("vec_id")).persist()
      collapsed.count()
      for ((df, variant) <- Seq((all, "full"), (collapsed, "tiered"))) {
        val n = df.count()
        val occ = Ann.bucketOccupancy(df, "embedding", 40, 3, 40)
          .persist()
        val bb = Ann.chooseBucketBits(occ, Ann.DefaultTargetSizeBiased)
        val fine = occ.filter(col("bucket_bits") === 40).head()
        val ch = occ.filter(col("bucket_bits") === bb).head()
        occ.unpersist()
        val cand = Ann.knnGraphCandidates(df, df, "vec_id", "embedding",
          40, bb, Ann.DefaultMaxProbes, Ann.DefaultMaxBucketGroup)
          .count()
        println(f"TIER $variant: n=$n%,d fineMax=${fine.getLong(2)}%,d " +
          f"fineSb=${fine.getDouble(3)}%.2f bb=$bb chMax=${ch.getLong(2)}%,d " +
          f"chSb=${ch.getDouble(3)}%.1f cand=$cand%,d " +
          f"candvec=${cand.toDouble / n}%.0f")
      }
    }
    spark.stop()
  }
}
