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
}
