package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering — the storage-side lever
  * the relational queries rely on at 100 TB. A parquet scan prunes
  * row groups and files by min/max statistics; those statistics are
  * only tight if the writer CLUSTERED rows so each file covers a
  * small box of the filter space. Sorting by one column makes that
  * column's ranges tight and every other column's ranges full-width;
  * interleaving the bits of two columns (a Morton / Z-order curve)
  * bounds BOTH dimensions per bucket — the `OPTIMIZE ZORDER BY`
  * capability of modern lakehouse writers, expressed here as plain
  * integer column arithmetic so a layout's skipping power is
  * measurable (and oracle-checkable) rather than asserted.
  *
  * Everything is exact integer math (scale → interleave → prefix
  * bucket): no sampling, no floating point, no RangePartitioner —
  * the SAME bucket ids fall out in any engine. At deployment scale
  * the z column is what you `repartitionByRange(z).sortWithinPartitions
  * (z).write` by; the prefix-bucket formulation here is the
  * deterministic stand-in that keeps the bucket → rows mapping
  * replayable in SQL (a range-sampled partitioning would not be).
  */
object Layout {

  /** `v` scaled into [0, 2^16) given per-dataset min/max columns —
    * exact integer arithmetic: (v − min) · 65535 div (max − min).
    * Two branches, picked PER ROW on the domain width (codegen's If
    * evaluates only the taken side, and the width is constant per
    * dataset, so one branch predicts perfectly):
    *  - width < 2^37: long product + exact-multiple double division
    *    (subtract the pmod remainder first). Every operand stays under
    *    2^53, so the long→double conversions are exact and no rounding
    *    can cross an integer — the fast codegen path for real keys.
    *  - wider: the same arithmetic in DECIMAL(38,0). Long arithmetic
    *    would overflow the ·65535 product past ~2^47, and the double
    *    division loses integer exactness past ~2^37 (a rounded
    *    conversion can shift a bucket id, breaking the
    *    bit-reproducibility this module promises); decimal keeps every
    *    intermediate exact over the full long domain.
    * The quotient is an integer ≤ 65535 by construction, so the final
    * long cast is exact in both branches. Degenerate domains
    * (max = min) collapse to 0. */
  def scale16(v: Column, vMin: Column, vMax: Column): Column = {
    val numL = (v - vMin) * lit(65535L)
    val denL = vMax - vMin
    val dec: Column => Column = _.cast("decimal(38,0)")
    val numD = (dec(v) - dec(vMin)) * lit(65535L)
    val denD = dec(vMax) - dec(vMin)
    // the WIDTH test runs in decimal too: vMax - vMin itself overflows
    // an ANSI long subtraction when the domain spans most of the long
    // range — exactly the case the decimal branch exists for
    when(denD === 0, lit(0L))
      .when(denD < lit(1L << 37),
        ((numL - pmod(numL, denL)) / denL).cast("long"))
      .otherwise(((numD - pmod(numD, denD)) / denD).cast("long"))
  }

  /** 32-bit Morton code of two 16-bit coordinates: bit b of `x` lands
    * at position 2b, bit b of `y` at 2b+1 — a fixed fold of 32 shifts
    * and masks, fully codegen'd. */
  def morton16(x: Column, y: Column): Column =
    (0 until 16).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** Skipping scorecard for ONE layout: rows already carry a bucket
    * id and scaled coords; a bucket is TOUCHED by the box predicate
    * [xLo,xHi]×[yLo,yHi] iff its per-bucket bounding box overlaps it
    * — exactly the min/max-statistics test a reader runs per file.
    * Returns one row: (layout, n_buckets, buckets_touched,
    * rows_scanned) — two fixed-size aggregates (buckets, then their
    * rollup), nothing driver-side.
    */
  def skipStats(rows: DataFrame, bucket: Column, x: Column, y: Column,
                layout: String, xLo: Long, xHi: Long,
                yLo: Long, yHi: Long): DataFrame = {
    val touched = col("min_x") <= xHi && col("max_x") >= xLo &&
      col("min_y") <= yHi && col("max_y") >= yLo
    rows.select(bucket.as("bucket"), x.as("x"), y.as("y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(touched, 1L).otherwise(0L)).as("buckets_touched"),
        sum(when(touched, col("cnt")).otherwise(0L)).as("rows_scanned"))
      .select(lit(layout).as("layout"), col("n_buckets"),
        col("buckets_touched"), col("rows_scanned"))
  }
}
