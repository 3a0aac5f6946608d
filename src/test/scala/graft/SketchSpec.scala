package graft

import graft.operators.Sketch
import org.apache.spark.sql.functions._

/** HLL sketch: merge algebra, small-range accuracy, error bound. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hllMerge(union of groups) equals registers of the union — " +
      "the property that makes sketches fold across corpora") {
    val vals = (1 to 3000)
      .map(i => (if (i % 2 == 0) "a" else "b", s"val_$i"))
      .toDF("g", "v")
    val perGroup = Sketch.hllRegisters(vals, Seq("g"), col("v"), 6)
    val merged = Sketch.hllMerge(perGroup, Nil)
      .orderBy("bucket").as[(Long, Int)].collect().toSeq
    val direct = Sketch
      .hllRegisters(vals.withColumn("g", lit("x")), Seq("g"), col("v"), 6)
      .select("bucket", "reg")
      .orderBy("bucket").as[(Long, Int)].collect().toSeq
    assert(merged == direct)
  }

  test("small-range correction: a 30-distinct set estimates near 30, " +
      "not the raw-HLL blowup") {
    val vals = (1 to 30).map(i => ("g", s"item_$i")).toDF("g", "v")
    val est = Sketch.hllEstimate(
        Sketch.hllRegisters(vals, Seq("g"), col("v"), 6), Seq("g"), 6)
      .select("ndv_hll").head().getDouble(0)
    assert(math.abs(est - 30) / 30.0 < 0.25,
      s"linear-counting regime estimate off: $est for 30 distinct")
  }

  test("estimate tracks exact within the m=64 error regime on 5k " +
      "distinct values; duplicates don't move it") {
    val vals = (1 to 5000).map(i => ("g", s"u_$i")).toDF("g", "v")
    val withDups = vals.unionByName(
      (1 to 2000).map(i => ("g", s"u_$i")).toDF("g", "v"))
    val est = Sketch.hllEstimate(
        Sketch.hllRegisters(withDups, Seq("g"), col("v"), 6),
        Seq("g"), 6)
      .select("ndv_hll").head().getDouble(0)
    // 1.04/sqrt(64) ≈ 13% standard error; allow 3 sigma
    assert(math.abs(est - 5000) / 5000.0 < 0.4,
      s"estimate $est too far from 5000")
    val estNoDups = Sketch.hllEstimate(
        Sketch.hllRegisters(vals, Seq("g"), col("v"), 6), Seq("g"), 6)
      .select("ndv_hll").head().getDouble(0)
    assert(est == estNoDups, "HLL must be insensitive to duplicates")
  }
}
