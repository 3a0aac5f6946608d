package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remaining §2.2 capability-matrix rows not exercised by the oracle
  * queries: schema-full JSON parsing (from_json → struct/map) and
  * HLL-sketch approximate distinct counts (engine-specific sketches, so
  * no cross-engine oracle — asserted against exact counts instead).
  */
class MiscFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("from_json parses props into typed struct and map columns") {
    val df = Seq((1L, """{"k": 7, "tag": "x"}"""), (2L, """{"k": 9}"""))
      .toDF("id", "props")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("tag", StringType)))
    val parsed = df.select(
        col("id"),
        from_json(col("props"), schema).as("s"),
        from_json(col("props"), MapType(StringType, StringType)).as("m"))
      .select(col("id"), col("s.k"), col("s.tag"),
        map_keys(col("m")).as("keys"))
      .as[(Long, Long, Option[String], Seq[String])].collect().toSeq
      .sortBy(_._1)
    assert(parsed == Seq(
      (1L, 7L, Some("x"), Seq("k", "tag")),
      (2L, 9L, None, Seq("k"))))
  }

  test("approx_count_distinct lands within 5% of exact on lineitem keys") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val (exact, approx) = li.agg(
        countDistinct(col("l_partkey")).as("e"),
        approx_count_distinct(col("l_partkey")).as("a"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("hll_sketch_agg: mergeable distinct sketches — union of halves " +
      "equals the whole") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_orderkey"), col("l_partkey"))
    // the property that makes approx-distinct work at 100 TB: sketches
    // built on disjoint partitions MERGE (per-executor partials, one
    // tiny binary each) — and merging loses nothing vs sketching the
    // whole dataset in one pass
    val whole = li.agg(
        hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("n"))
      .as[Long].head()
    val halves = li
      .withColumn("half", (col("l_orderkey") % 2).cast("int"))
      .groupBy("half")
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .as[Long].head()
    // union promotes the sketch's internal representation (HLL_4 →
    // HLL_8), so estimates are close but NOT bit-identical to the
    // single-pass sketch — the contract is accuracy, not equality
    val exact = li.agg(countDistinct(col("l_partkey"))).as[Long].head()
    assert(math.abs(whole - exact).toDouble / exact < 0.05,
      s"hll=$whole exact=$exact")
    assert(math.abs(halves - exact).toDouble / exact < 0.05,
      s"merged hll=$halves exact=$exact")
  }

  test("approx_percentile tracks exact percentiles within its accuracy") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val row = li.agg(
        expr("percentile(l_extendedprice, array(0.5, 0.9))").as("exact"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)")
          .as("approx"))
      .as[(Seq[Double], Seq[Double])].head()
    row._1.zip(row._2).foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.02, s"approx=$a exact=$e") }
  }
}
