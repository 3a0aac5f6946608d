package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 5L, "l1"), (1L, 10L, "l2"), (1L, 2L, "l0"),
    (2L, 7L, "m1"))
    .toDF("k", "t", "tag")
  private def right = Seq(
    (1L, 3L, 30.0), (1L, 7L, 70.0), (1L, 10L, 100.0),
    (2L, 99L, 990.0))
    .toDF("k", "rt", "v")

  test("as-of picks the latest right row at or before each left time") {
    val got = AsOf.asOfJoin(left, right, "k", "t", "rt", Seq("v"))
      .select("k", "t", "tag", "v")
      .as[(Long, Long, String, Option[Double])].collect().toSet
    assert(got == Set(
      (1L, 2L, "l0", None),        // nothing at or before t=2
      (1L, 5L, "l1", Some(30.0)),  // rt=3
      (1L, 10L, "l2", Some(100.0)), // rt=10 inclusive
      (2L, 7L, "m1", None)))       // right exists only in the future
  }

  test("a NULL value on the latest right row is carried as NULL, not skipped") {
    val r = Seq((1L, 3L, Some(30.0)), (1L, 7L, None))
      .toDF("k", "rt", "v")
    val got = AsOf.asOfJoin(left.filter(col("t") === 10), r, "k",
        "t", "rt", Seq("v"))
      .select("v").as[Option[Double]].collect().toSeq
    // latest right row (rt=7) wins even though its value is NULL —
    // ASOF semantics, not "latest non-null"
    assert(got == Seq(None))
  }

  test("forward as-of picks the earliest right row at or after each left time") {
    val got = AsOf.asOfJoinForward(left, right, "k", "t", "rt", Seq("v"))
      .select("k", "t", "tag", "v")
      .as[(Long, Long, String, Option[Double])].collect().toSet
    assert(got == Set(
      (1L, 2L, "l0", Some(30.0)),   // next right is rt=3
      (1L, 5L, "l1", Some(70.0)),   // next right is rt=7
      (1L, 10L, "l2", Some(100.0)), // rt=10 inclusive
      (2L, 7L, "m1", Some(990.0)))) // the future right now matches
  }

  test("forward as-of yields NULL when no right row follows") {
    val r = Seq((1L, 3L, 30.0)).toDF("k", "rt", "v")
    val got = AsOf.asOfJoinForward(left.filter(col("t") === 10), r, "k",
        "t", "rt", Seq("v"))
      .select("v").as[Option[Double]].collect().toSeq
    assert(got == Seq(None))
  }

  test("as-of never crosses keys") {
    val got = AsOf.asOfJoin(left.filter(col("k") === 2), right, "k",
        "t", "rt", Seq("v"))
      .select("v").as[Option[Double]].collect().toSeq
    assert(got == Seq(None))
  }

  test("left rows and columns pass through unchanged") {
    val out = AsOf.asOfJoin(left, right, "k", "t", "rt", Seq("v"))
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("k", "t", "tag", "v"))
  }
}
