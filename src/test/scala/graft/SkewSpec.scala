package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of rows share key 1, the rest spread over 2..5
  private def big = (1 to 200).map(i =>
    (if (i <= 180) 1L else (i % 4 + 2).toLong, s"row$i")).toDF("k", "payload")
  private def small = Seq((1L, "a"), (2L, "b"), (3L, "c"),
    (4L, "d"), (5L, "e")).toDF("k", "dim")

  test("saltedJoin returns exactly the rows of the plain join") {
    val plain = big.join(small, "k")
      .select("k", "payload", "dim").as[(Long, String, String)]
      .collect().toSeq.sorted
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "dim").as[(Long, String, String)]
      .collect().toSeq.sorted
    assert(salted == plain)
    assert(salted.count(_._1 == 1L) == 180)
  }

  test("salts spread a hot key across multiple shuffle keys") {
    val spread = big.withColumn("__salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .filter(col("k") === 1L)
      .select("__salt").distinct().count()
    assert(spread > 1, "hot key stayed on a single salt")
  }

  test("keyHistogram surfaces the hot key first") {
    val top = Skew.keyHistogram(big, "k", 1).as[(Long, Long)].head()
    assert(top == (1L, 180L))
  }
}
