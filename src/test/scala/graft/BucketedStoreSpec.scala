package graft

import graft.operators.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The 100 TB co-location story, proven on the plan: two stores
  * bucketed on the same key sort-merge-join with NO exchange on either
  * side — the shuffle was paid once at write time.
  */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join without any shuffle exchange") {
    val dir = Files.createTempDirectory("graft_bucketed").toString
    val docs = (1L to 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val embs = (1L to 1000L).map(i => (i, Array(i.toFloat, 1f)))
      .toDF("doc_id", "embedding")
    Ingest.writeStoreBucketed(docs, "graft_docs_b", s"$dir/docs",
      "doc_id", 4)
    Ingest.writeStoreBucketed(embs, "graft_embs_b", s"$dir/embs",
      "doc_id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_docs_b")
        .join(spark.table("graft_embs_b"), "doc_id")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.takeWhile(_ != '\n'))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_docs_b")
      spark.sql("DROP TABLE IF EXISTS graft_embs_b")
    }
  }

  test("snapshotDiff over same-bucketed snapshots runs without any " +
      "shuffle exchange") {
    // the i16 scale claim proven on the plan: when both store versions
    // share a bucketed layout on the key, the CDC full-outer join
    // co-locates — the only shuffle was paid at write time
    val dir = Files.createTempDirectory("graft_bucketed_cdc").toString
    val v1 = (1L to 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val v2 = (3L to 1002L)
      .map(i => (i, if (i % 13 == 0) s"doc $i v2" else s"doc $i"))
      .toDF("doc_id", "text")
    Ingest.writeStoreBucketed(v1, "graft_cdc_v1", s"$dir/v1", "doc_id", 4)
    Ingest.writeStoreBucketed(v2, "graft_cdc_v2", s"$dir/v2", "doc_id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val diff = Ingest.snapshotDiff(spark.table("graft_cdc_v1"),
        spark.table("graft_cdc_v2"), "doc_id", "text")
      val counts = diff.groupBy("change_type").count()
        .as[(String, Long)].collect().toMap
      assert(counts == Map("delete" -> 2L, "insert" -> 2L,
        "update" -> 76L, "unchanged" -> 922L), s"got $counts")
      val plan = diff.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.takeWhile(_ != '\n'))
      assert(!plan.contains("Exchange"),
        s"bucketed CDC diff must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_cdc_v1")
      spark.sql("DROP TABLE IF EXISTS graft_cdc_v2")
    }
  }

  test("bucketed store round-trips data intact") {
    val dir = Files.createTempDirectory("graft_bucketed2").toString
    val docs = (1L to 100L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    Ingest.writeStoreBucketed(docs, "graft_docs_rt", s"$dir/docs",
      "doc_id", 2)
    try {
      val back = spark.table("graft_docs_rt")
        .orderBy("doc_id").as[(Long, String)].collect()
      assert(back.length == 100 && back(41) == (42L, "text 42"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_docs_rt")
  }
}
