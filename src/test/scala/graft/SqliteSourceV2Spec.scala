package graft

import java.nio.file.{Files, Paths}

import graft.sources.{Sources, SqliteReader}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types._

/** The DSv2 registration (`format("sqlite")`) against both halves of
  * the migration seam: the REFERENCE's own vectors.db (read parity
  * with [[Sources.fromSqliteDocumentsRaw]]) and the engine's own
  * full-schema export (write → DSv2 read round-trip). Column pruning
  * is asserted at the plan level (the scan's readSchema) AND at the
  * decode level ([[SqliteReader.readTableProjected]] skips bodies).
  */
class SqliteSourceV2Spec extends SparkSpec {

  private val RefDb = "/root/reference/vectors.db"

  test("format(\"sqlite\") reads the reference vectors.db with an " +
      "inferred DDL schema, matching the library route") {
    val df = spark.read.format("sqlite").load(RefDb)
    assert(df.schema == StructType(Seq(
      StructField("id", LongType),
      StructField("content", StringType),
      StructField("vector", BinaryType))))
    val viaLib = Sources.fromSqliteDocumentsRaw(spark, RefDb)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Array[Byte]](2).toSeq))
    val viaV2 = df.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Array[Byte]](2).toSeq))
    assert(viaV2.length == 7 && viaV2.toSeq == viaLib.toSeq)
  }

  test("a blob-free projection prunes the scan to (id, content)") {
    val df = spark.read.format("sqlite").load(RefDb)
      .select("content", "id")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan.readSchema()
    }
    assert(scans.nonEmpty)
    assert(scans.head.fieldNames.toSeq == Seq("id", "content"),
      s"pruned readSchema was ${scans.head.fieldNames.toSeq}")
    // values still correct through the projected decode
    val got = df.orderBy("id").collect()
      .map(r => (r.getString(0).take(20), r.getLong(1)))
    assert(got.length == 7 && got.map(_._2).toSeq == (1L to 7L))
  }

  test("readTableProjected skips unrequested bodies but keeps values " +
      "and the rowid alias") {
    val bytes = Files.readAllBytes(Paths.get(RefDb))
    val full = SqliteReader.readTable(bytes, "documents").toSeq
    val proj = SqliteReader
      .readTableProjected(bytes, "documents", Array(2, 0)).toSeq
    assert(proj.length == full.length)
    proj.zip(full).foreach { case (p, f) =>
      assert(p(1) == f.values(0)) // rowid alias on ordinal 0
      assert(p(0).asInstanceOf[Array[Byte]].toSeq ==
        f.values(2).asInstanceOf[Array[Byte]].toSeq)
    }
  }

  test("write -> DSv2 read round-trip over a full-schema export") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("content", StringType, nullable = false),
      StructField("vector", BinaryType, nullable = false)))
    val rows = (1L to 40L).map(i =>
      Row(i, f"doc-$i%03d", Array.tabulate(24)(j => (i + j).toByte)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val dir = Files.createTempDirectory("graft_dsv2").toString
    val db = Paths.get(dir, "t.db").toString
    Sources.toSqliteDocuments(df, db, numPartitions = 3,
      fullSchema = true)
    val back = spark.read.format("sqlite").load(db)
    assert(back.schema.fieldNames.toSeq ==
      Seq("id", "content", "vector"))
    val got = back.orderBy("id").collect()
    assert(got.length == 40)
    assert(got.map(_.getLong(0)).toSeq == (1L to 40L))
    assert(got(4).getString(1) == "doc-005")
    assert(got(39).getAs[Array[Byte]](2).toSeq ==
      Array.tabulate(24)(j => (40 + j).toByte).toSeq)
    // directory + table option route: load the parent dir
    val viaDir = spark.read.format("sqlite")
      .option("table", "documents").load(dir)
    assert(viaDir.count() == 40)
  }
}
