package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) handles most
  * cases at runtime; explicit salting remains the tool when one join key
  * dominates so badly that even split partitions bottleneck, or when AQE
  * is unavailable (e.g. inside some streaming plans).
  */
object Skew {

  /** Inner equi-join with the big side salted: every big-side row gets a
    * pseudorandom salt in [0, salts), the small side is exploded
    * `salts`-fold, and the join key becomes (key, salt) — a hot key's
    * rows now land on `salts` reducers instead of one. Result set equals
    * the unsalted join exactly; only the shuffle layout changes.
    *
    * The salt must vary WITHIN a key (that is the whole point), so it is
    * derived from the whole row plus a per-row ordinal
    * (`monotonically_increasing_id`) — without the ordinal, fully
    * IDENTICAL duplicate rows (a common real skew shape: repeated
    * events) would all hash to one salt and still pile onto a single
    * reducer. Any salt value is correct for an inner equi-join (the
    * small side carries every salt), so nondeterminism here only moves
    * rows between reducers, never changes the result.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = big.withColumn("__salt",
      pmod(xxhash64((big.columns.map(col)
        :+ monotonically_increasing_id()).toIndexedSeq: _*), lit(salts)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-n heaviest values of a column with their frequencies — the
    * standard pre-flight check before choosing a salting factor.
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count("*").as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
