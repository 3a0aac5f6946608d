package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product.
  *
  * Spark's planner turns a raw `p BETWEEN lo AND hi` theta join into
  * BroadcastNestedLoopJoin (every point × every interval) — fine for a
  * handful of intervals, a cluster killer for many. The standard scale
  * formulation buckets the number line: a point lands in exactly one
  * bucket of width `w`; an interval is exploded to every bucket it
  * overlaps (⌈len/w⌉+1 rows); the join becomes a shuffled EQUI-join on
  * bucket id, post-filtered by the exact predicate. Each qualifying
  * (point, interval) pair is produced exactly once because the point
  * occupies exactly one bucket — no dedup pass needed.
  *
  * Cost model: interval fan-out is (hi−lo)/w + 1, per-bucket work is
  * |points in bucket| × |intervals overlapping bucket| — pick `w` near
  * the typical interval length so fan-out stays O(1) while buckets stay
  * selective. The reference has no joins at all beyond id lookup
  * (server.js:231-248); this is engine-level capability its pipeline
  * shape (session windows, promo windows, as-of enrichment) needs at
  * scale.
  */
object RangeJoin {

  /** Inner-join `points` to every interval containing them.
    * `pointCol`/`loCol`/`hiCol` are numeric (cast dates to epoch days
    * first); bounds are inclusive. Column names must not collide across
    * the two inputs.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c / lit(bucketWidth.toDouble)).cast("long")
    val pb = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
