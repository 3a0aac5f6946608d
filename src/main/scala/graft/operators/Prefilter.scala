package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join prefilter — the "runtime filter" pattern for
  * joins where the dimension side is too large to broadcast as a hash
  * relation but its KEY SET fits a compact sketch.
  *
  * At 100 TB the big side of a shuffled join pays its full scan+shuffle
  * even when the join keeps 1% of rows; pushing a bloom filter of the
  * dim keys into the big side's scan drops non-matching rows before the
  * shuffle. Bloom filters have no false negatives, so
  * `bloomSemiFilter(big, dim) join dim` is semantically identical to
  * `big join dim` — false positives are eliminated by the exact join
  * that follows (the oracle for r31 pins exactly this equivalence).
  *
  * Spark's own AQE runtime filter (spark.sql.optimizer.runtime
  * .bloomFilter.enabled) injects the same construct automatically when
  * its size thresholds are met; this operator makes the pattern
  * explicit and tunable. The membership probe is a UDF because Spark
  * exposes no public might_contain column function — the sketch itself
  * is built distributed (one aggregate job) and shipped to executors as
  * a broadcast variable, so the probe is a narrow, shuffle-free filter.
  */
object Prefilter {

  /** Filter `big` down to rows whose `bigKey` (a long) might be present
    * in `dim`'s `dimKey` column. Guaranteed to keep every true match.
    *
    * Lifecycle: the broadcast sketch is reclaimed by Spark's
    * ContextCleaner once the returned plan (whose UDF closure holds the
    * only reference) becomes unreachable — the same GC-driven cleanup
    * Spark applies to its own runtime-filter broadcasts, so repeated
    * calls do not accumulate live broadcasts.
    */
  def bloomSemiFilter(big: DataFrame, dim: DataFrame, bigKey: String,
                      dimKey: String, expectedKeys: Long,
                      fpp: Double): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bfB = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))
    big.filter(mightContain(col(bigKey)))
  }
}
