package graft

import graft.operators.Prefilter
import org.apache.spark.sql.functions._

/** Bloom semi-join prefilter: the no-false-negative guarantee (the
  * property that makes `prefilter then exact join` ≡ `join`, which the
  * r31 oracle pins end-to-end) plus actual selectivity on disjoint keys.
  */
class PrefilterSpec extends SparkSpec {
  import spark.implicits._

  private def keyed(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag)).toDF("k", "tag")

  test("bloomSemiFilter keeps EVERY true match (no false negatives)") {
    val big = keyed(0 until 2000, "big")
    val dim = keyed(500 until 600, "dim").withColumnRenamed("k", "dk")
    val kept = Prefilter
      .bloomSemiFilter(big, dim, "k", "dk", expectedKeys = 1000L, fpp = 0.05)
      .select("k").as[Long].collect().toSet
    assert((500L until 600L).forall(kept.contains))
  }

  test("bloomSemiFilter drops most non-matching rows at the target fpp") {
    val big = keyed(0 until 2000, "big")
    val dim = keyed(10000 until 10100, "dim").withColumnRenamed("k", "dk")
    val kept = Prefilter
      .bloomSemiFilter(big, dim, "k", "dk", expectedKeys = 1000L, fpp = 0.01)
      .count()
    // disjoint key ranges: everything kept is a false positive; allow
    // 10x the nominal 1% rate before calling the sketch broken
    assert(kept <= 200, s"kept $kept of 2000 disjoint keys")
  }

  test("probe is the codegen'd built-in expression, not a ScalaUDF") {
    // spark.range, not a local Seq: a Filter over a LocalRelation is
    // constant-folded away and the probe would vanish from the plan
    val big = spark.range(100).select(col("id").as("k"))
    val dim = keyed(0 until 10, "dim").withColumnRenamed("k", "dk")
    val plan = Prefilter
      .bloomSemiFilter(big, dim, "k", "dk", expectedKeys = 100L, fpp = 0.05)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"built-in probe missing:\n$plan")
    assert(!plan.contains("UDF"), s"ScalaUDF still in the probe path:\n$plan")
  }

  test("bloomSemiFilter fails fast on a non-bigint key") {
    val big = keyed(0 until 10, "big").withColumn("ki", col("k").cast("int"))
    val dim = keyed(0 until 5, "dim").withColumnRenamed("k", "dk")
    val e = intercept[IllegalArgumentException] {
      Prefilter.bloomSemiFilter(big, dim, "ki", "dk", 100L, 0.05)
    }
    assert(e.getMessage.contains("must be BIGINT"))
  }

  test("bloomSemiFilter fails fast instead of letting the aggregate " +
      "silently clamp an oversize sketch") {
    val big = keyed(0 until 10, "big")
    val dim = keyed(0 until 5, "dim").withColumnRenamed("k", "dk")
    val e = intercept[IllegalArgumentException] {
      // default runtime-filter cap is 4M items — 50M would be clamped
      Prefilter.bloomSemiFilter(big, dim, "k", "dk",
        expectedKeys = 50_000_000L, fpp = 0.01)
    }
    assert(e.getMessage.contains("maxNumItems"))
  }

  test("bloomSemiFilter with an empty dim keeps nothing") {
    val big = keyed(0 until 10, "big")
    val dim = keyed(0 until 5, "dim").withColumnRenamed("k", "dk")
      .filter(col("dk") < 0)
    assert(Prefilter.bloomSemiFilter(big, dim, "k", "dk", 100L, 0.05)
      .count() == 0)
  }
}
