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

  test("CMS never underestimates, and is exact for every key when " +
      "the grid is collision-checkably wide") {
    val rng = new scala.util.Random(7)
    // zipfy-ish: key k_i appears i times — 40 keys, 820 rows
    val rows = (1 to 40).flatMap(i => Seq.fill(i)(("g", s"k_$i")))
    val df = rng.shuffle(rows).toDF("g", "v")
    val exact = df.groupBy("v").agg(count(lit(1)).as("cnt_exact"))
    val cms = Sketch.cmsMerge(
      Sketch.cmsTable(df, Seq("g"), col("v"), depth = 3, width = 64),
      Nil)
    val got = Sketch
      .cmsEstimate(cms, exact, col("v"), depth = 3, width = 64)
      .as[(String, Long, Long)].collect()
    assert(got.length == 40)
    got.foreach { case (k, ex, est) =>
      assert(est >= ex, s"CMS underestimated $k: $est < $ex")
    }
    // 40 keys into 3 independent rows of 4096 cells: min-over-rows is
    // exact unless a key collides in ALL rows — vanishingly unlikely,
    // and the assertion would name the colliding key if it ever did
    val wide = Sketch.cmsMerge(
      Sketch.cmsTable(df, Seq("g"), col("v"), depth = 3, width = 4096),
      Nil)
    Sketch.cmsEstimate(wide, exact, col("v"), depth = 3, width = 4096)
      .as[(String, Long, Long)].collect()
      .foreach { case (k, ex, est) =>
        assert(est == ex, s"wide CMS not exact for $k: $est != $ex")
      }
  }

  test("cmsMerge(per-group tables) equals the table built over the " +
      "union; an absent key estimates 0 on an empty-cell miss") {
    val a = (1 to 200).map(i => ("a", s"x_${i % 17}")).toDF("g", "v")
    val b = (1 to 150).map(i => ("b", s"x_${i % 23}")).toDF("g", "v")
    val both = a.unionByName(b)
    val merged = Sketch
      .cmsMerge(Sketch.cmsTable(both, Seq("g"), col("v"), 3, 64), Nil)
      .orderBy("row_j", "cell").as[(Int, Long, Long)].collect().toSeq
    val direct = Sketch
      .cmsTable(both.withColumn("g", lit("x")), Seq("g"), col("v"), 3, 64)
      .select("row_j", "cell", "cnt")
      .orderBy("row_j", "cell").as[(Int, Long, Long)].collect().toSeq
    assert(merged == direct)
    // a key no row ever hashed near: with an empty sketch every cell
    // misses and the left-join coalesce floors the estimate at 0
    val empty = Sketch.cmsMerge(
      Sketch.cmsTable(both.limit(0), Seq("g"), col("v"), 3, 64), Nil)
    val est = Sketch
      .cmsEstimate(empty, Seq(("absent", 0L)).toDF("v", "cnt_exact"),
        col("v"), 3, 64)
      .select("cnt_cms").head().getLong(0)
    assert(est == 0L)
  }
}
