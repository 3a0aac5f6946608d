package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq((1L, 5L), (2L, 10L), (3L, 29L), (4L, 31L),
    (5L, -7L), (6L, 100L)).toDF("pid", "p")
  private def intervals = Seq(
    (10L, 0L, 30L),    // spans buckets 0..3 at width 10
    (20L, 25L, 35L),   // overlaps interval 10 in [25,30]
    (30L, -10L, -1L),  // negative range
    (40L, 50L, 60L))   // matches nothing
    .toDF("iid", "lo", "hi")

  /** Ground truth by brute force. */
  private def naive = points.crossJoin(intervals)
    .filter(col("p") >= col("lo") && col("p") <= col("hi"))
    .select("pid", "iid")

  test("bucketed result equals the naive cross-filter, exactly once") {
    for (w <- Seq(1L, 3L, 10L, 100L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
          "p", "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      val want = naive.as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"width $w: $got != $want")
      assert(got.distinct == got, s"width $w produced duplicate pairs")
    }
  }

  test("inclusive bounds and negative coordinates") {
    val got = RangeJoin.pointInInterval(points, intervals,
        "p", "lo", "hi", 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    assert(got.contains((5L, 30L)), "negative point must match")
    assert(got.contains((3L, 20L)) && got.contains((3L, 10L)),
      "boundary-ish point in two overlapping intervals")
    assert(!got.exists(_._2 == 40L), "empty interval must match nothing")
  }

  test("rejects non-positive bucket width") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 0L)
    }
  }
}
