package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the latest right row
  * with `rightTime <= leftTime` within the same key — the
  * event-enrichment primitive (feature lookups, slowly-changing state)
  * that training-data pipelines need and the reference lacks entirely
  * (SURVEY.md §2.2 "as-of: absent").
  *
  * Built by composition (the preferred path before custom plans —
  * /opt/skills/guides/spark_guide.md's own example operator): union both
  * sides tagged, ONE window per key ordered by (time, side) with rights
  * sorting before lefts on ties (inclusive semantics, matching DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t`), then `last(value, ignoreNulls)`
  * carries the most recent right value forward. One shuffle, keyed by
  * the join key — the same exchange a sort-merge join would pay, with no
  * per-row subquery or range explosion.
  *
  * Right rows must be unique per (key, time) — pre-aggregate if not, or
  * ties are resolved by union order (nondeterministic).
  */
object AsOf {

  /** Backward as-of (the default direction): latest right row with
    * `rightTime <= leftTime`.
    *
    * @param valueCols right-side columns carried onto left rows; must
    *                   not collide with left column names (rename on the
    *                   right first) */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               valueCols: Seq[String]): DataFrame =
    impl(left, right, key, leftTime, rightTime, valueCols,
      backward = true)

  /** Forward as-of: the EARLIEST right row with `rightTime >= leftTime`
    * — "what happens next" enrichment (next session event, next price
    * tick), the mirror of [[asOfJoin]] with the window looking ahead.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      valueCols: Seq[String]): DataFrame =
    impl(left, right, key, leftTime, rightTime, valueCols,
      backward = false)

  private def impl(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   valueCols: Seq[String], backward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.forall(c => !leftCols.contains(c)),
      s"valueCols must not collide with left columns: " +
        s"${valueCols.filter(leftCols.contains)}")
    val reserved = Seq("__t", "__left", "__vals")
    require(!leftCols.exists(reserved.contains),
      s"left columns collide with asOfJoin internals: " +
        s"${leftCols.filter(reserved.contains)}")
    val l = left.withColumn("__t", col(leftTime)).withColumn("__left", lit(1))
    // values ride in ONE struct: the struct is non-null for every right
    // row even when individual value columns are legitimately NULL, so
    // last/first(ignoreNulls) carries the nearest right row verbatim
    // instead of skipping to an older row's non-null value
    val r = right.select(
      col(key), col(rightTime).as("__t"), lit(0).as("__left"),
      struct(valueCols.map(col): _*).as("__vals"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // tie ordering makes both directions INCLUSIVE: backward sorts
    // rights before lefts at equal time (rt <= lt), forward sorts lefts
    // before rights (lt <= rt)
    val w = Window.partitionBy(col(key))
    val carried =
      if (backward)
        last(col("__vals"), ignoreNulls = true).over(
          w.orderBy(col("__t"), col("__left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__vals"), ignoreNulls = true).over(
          w.orderBy(col("__t"), col("__left").desc)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    unioned
      .withColumn("__vals", carried)
      .filter(col("__left") === 1)
      .select((leftCols.map(col) ++
        valueCols.map(c => col(s"__vals.$c").as(c))): _*)
  }
}
