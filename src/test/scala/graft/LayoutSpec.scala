package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: exact scaling, Morton interleave, bbox skipping. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("scale16 maps min to 0, max to 65535, midpoint to ~32767, " +
      "degenerate domain to 0") {
    val df = Seq(0L, 50L, 100L, 100L).toDF("v")
      .crossJoin(Seq((0L, 100L)).toDF("lo", "hi"))
    val got = df.select(Layout.scale16(col("v"), col("lo"), col("hi")))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 32767L, 65535L, 65535L))
    val degen = Seq(7L).toDF("v")
      .select(Layout.scale16(col("v"), lit(7L), lit(7L)))
      .as[Long].head()
    assert(degen == 0L)
  }

  test("scale16 stays exact on domains wider than 2^37 (where double " +
      "division rounds) and at the extremes of the long range") {
    // v = lo + k·(hi−lo)/65535 for exact-boundary k: the quotient must
    // come back exactly k. A double-division implementation is off by
    // one at some of these once (v−lo)·65535 exceeds 2^53.
    val lo = Long.MinValue
    val hi = Long.MaxValue - 1 // even width, so /2 boundaries are exact
    val width = java.math.BigInteger.valueOf(hi)
      .subtract(java.math.BigInteger.valueOf(lo))
    val cases = Seq(0L, 1L, 32767L, 32768L, 65534L, 65535L).map { k =>
      java.math.BigInteger.valueOf(lo).add(
        width.multiply(java.math.BigInteger.valueOf(k))
          .divide(java.math.BigInteger.valueOf(65535L)))
        .longValueExact()
    }
    // expected bucket via BigInteger: (v − lo)·65535 div (hi − lo)
    cases.foreach { v =>
      val want = java.math.BigInteger.valueOf(v)
        .subtract(java.math.BigInteger.valueOf(lo))
        .multiply(java.math.BigInteger.valueOf(65535L))
        .divide(width).longValueExact()
      val got = Seq(v).toDF("v")
        .select(Layout.scale16(col("v"), lit(lo), lit(hi)))
        .as[Long].head()
      assert(got == want, s"scale16($v) = $got, want $want")
      assert(got >= 0L && got <= 65535L)
    }
  }

  test("morton16 interleaves bits: known codes, and x/y recoverable " +
      "ranges stay disjoint across prefix buckets") {
    // x=0b11, y=0b01: x0→bit0, y0→bit1, x1→bit2 ⇒ 0b0111 = 7
    val known = Seq((3L, 1L, 7L), (0L, 0L, 0L), (1L, 0L, 1L),
      (0L, 1L, 2L), (65535L, 65535L, (1L << 32) - 1))
    known.foreach { case (x, y, want) =>
      val z = Seq((x, y)).toDF("x", "y")
        .select(Layout.morton16(col("x"), col("y"))).as[Long].head()
      assert(z == want, s"morton($x,$y)=$z, want $want")
    }
  }

  test("skipStats: a bucket is touched iff its bbox overlaps the " +
      "probe box; rows_scanned sums only touched buckets") {
    // bucket 0: x∈[0,10] y∈[0,10]; bucket 1: x∈[100,110] y∈[100,110]
    val rows = Seq((0L, 0L, 0L), (0L, 10L, 10L),
      (1L, 100L, 100L), (1L, 110L, 110L), (1L, 105L, 105L))
      .toDF("b", "x", "y")
    val hit = Layout.skipStats(rows, col("b"), col("x"), col("y"),
        "t", 5L, 7L, 0L, 10L)
      .as[(String, Long, Long, Long)].head()
    assert(hit == (("t", 2L, 1L, 2L)),
      s"probe inside bucket 0 only: $hit")
    val miss = Layout.skipStats(rows, col("b"), col("x"), col("y"),
        "t", 50L, 60L, 50L, 60L)
      .as[(String, Long, Long, Long)].head()
    assert(miss == (("t", 2L, 0L, 0L)), s"probe between buckets: $miss")
  }

  test("on a uniform grid the z-layout touches fewer rows than a " +
      "single-dim sort for a 2-D box probe") {
    val grid = spark.range(0, 65536).select(
      (col("id") % 256 * 257).as("px"), (col("id") / 256 * 257)
        .cast("long").as("py"))
      .select(col("px").as("x"), col("py").as("y"))
      .withColumn("z", Layout.morton16(col("x"), col("y")))
    def scanned(bucket: org.apache.spark.sql.Column) =
      Layout.skipStats(grid, bucket, col("x"), col("y"), "g",
          6554L, 13107L, 16384L, 32768L)
        .select("rows_scanned").as[Long].head()
    val bySort = scanned(shiftright(col("x"), 8))
    val byZ = scanned(shiftright(col("z"), 24))
    assert(byZ < bySort,
      s"z-layout must scan fewer rows: z=$byZ sort=$bySort")
  }
}
