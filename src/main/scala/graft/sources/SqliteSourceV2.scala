package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 registration of the SQLite migration seam —
  * `spark.read.format("sqlite").load(pathOrGlob)` — so the
  * reader half of [[SqliteReader]]/[[SqliteWriter]] is reachable from
  * pure SQL / pyspark without Scala imports (round-15 verdict item:
  * the last step to first-class source parity with csv/json/orc/xml).
  *
  * Options: `table` (default `documents`) selects the rowid table;
  * `path` accepts a file, directory, or glob — ONE InputPartition per
  * .db file (a SQLite file is an inherently serial read; parallelism
  * is across files, exactly [[Sources.fromSqliteDocumentsRaw]]'s
  * contract).
  *
  * Schema: inferred from the table's stored `CREATE TABLE` DDL in
  * sqlite_master (INTEGER→LONG, REAL→DOUBLE, TEXT→STRING, BLOB→
  * BINARY, untyped/other→STRING — SQLite affinity rules' four storage
  * classes; the scope is the engine's own export surface plus
  * reference-shaped files, not arbitrary DDL).
  *
  * Column pruning is REAL, not cosmetic: the scan implements
  * [[SupportsPushDownRequiredColumns]] and the per-file reader hands
  * [[SqliteReader]] the kept ordinals — serial-type headers are
  * walked but skipped columns' bodies are never materialized, so a
  * `SELECT doc_id, content` over reference-shaped files never
  * allocates the 6 KiB vector blobs (ReadSchema in `.explain` shows
  * the pruned struct; SqliteSourceV2Spec asserts it).
  */
class SqliteTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "sqlite"

  override def supportsExternalMetadata(): Boolean = true

  private def tableName(options: CaseInsensitiveStringMap): String =
    Option(options.get("table")).getOrElse("documents")

  override def inferSchema(options: CaseInsensitiveStringMap)
      : StructType = {
    val files = SqliteSourceV2.resolveFiles(options)
    require(files.nonEmpty,
      s"sqlite source: no .db files at '${options.get("path")}'")
    SqliteSourceV2.schemaOf(
      SqliteSourceV2.readBytes(files.head,
        SqliteSourceV2.driverHadoopConf()), tableName(options))
  }

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SqliteTable(schema,
      new CaseInsensitiveStringMap(properties))
}

private[sources] class SqliteTable(schema: StructType,
                                   options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String =
    s"sqlite:${Option(options.get("table")).getOrElse("documents")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    // BATCH_WRITE admits the table into DataFrameWriter.save()'s V2
    // branch (it checks that capability literally); V1_BATCH_WRITE
    // tells the physical planner the built Write is a V1Write
    // fallback, routing to the InsertableRelation exec instead of
    // asking for a (nonexistent) BatchWrite
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)
  private def merged(opts: CaseInsensitiveStringMap)
      : CaseInsensitiveStringMap = {
    // merge table properties (captured at getTable) with per-op options
    val m = new util.HashMap[String, String]()
    options.entrySet().asScala.foreach(e => m.put(e.getKey, e.getValue))
    opts.entrySet().asScala.foreach(e => m.put(e.getKey, e.getValue))
    new CaseInsensitiveStringMap(m)
  }
  override def newScanBuilder(opts: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SqliteScanBuilder(schema, merged(opts))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new SqliteWriteBuilder(info.schema(), merged(info.options()))
}

/** The WRITE half of the `format("sqlite")` seam:
  * `df.write.format("sqlite").mode("overwrite").option("table", …)
  * .save(path)` assembles ONE fresh SQLite file through
  * [[SqliteWriter.writeFull]] — the distributed page assembly with
  * the per-partition leaf runs, optional UNIQUE autoindex
  * (`option("unique", <textCol>)` — the cross-partition boundary
  * check fires through this path too) and the format's single-FILE
  * final stream. Implemented as a [[org.apache.spark.sql.connector
  * .write.V1Write]]: the writer is driver-ORCHESTRATED (executors
  * build page runs; the driver streams them into one file — a SQLite
  * file is single-writer by format necessity), so the whole-DataFrame
  * InsertableRelation seam is the honest shape, not a per-task
  * DataWriter that would pretend the commit is distributed.
  *
  * Only `mode("overwrite")` is supported: append would have to read
  * and rewrite the existing b-tree (use the library's Ingest upsert
  * path for incremental adds). DDL is derived from the DataFrame
  * schema (first column = INTEGER PRIMARY KEY rowid alias — writeFull
  * enforces integral ids; LONG/INT→INTEGER, DOUBLE/FLOAT→REAL,
  * STRING→TEXT, BINARY→BLOB), so the read half's sqlite_master
  * inference round-trips it.
  */
private[sources] class SqliteWriteBuilder(
    schema: StructType, options: CaseInsensitiveStringMap)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var truncated = false
  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    truncated = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.V1Write {
      override def toInsertableRelation()
          : org.apache.spark.sql.sources.InsertableRelation = {
        require(truncated,
          "sqlite write: only mode(\"overwrite\") is supported — a " +
            "SQLite file is a single-writer store assembled whole; " +
            "append would read + rewrite the b-tree (use the " +
            "library's Ingest upsert path for incremental adds)")
        (data: org.apache.spark.sql.DataFrame, _: Boolean) =>
          SqliteSourceV2.writeLocal(data, schema, options)
      }
    }
}

private[sources] class SqliteScanBuilder(full: StructType,
                                         options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = full
  private var accepted: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty
  private var ranges: IndexedSeq[(Long, Long)] = SqliteReader.FullRange
  // content-key pushdown through the UNIQUE autoindex: None = not
  // constrained; Some(keys) = only rows whose unique column is one of
  // `keys` (possibly empty — contradictory equalities prune the scan)
  private var contentKeys: Option[Seq[String]] = None
  private var uniqueCol: Option[String] = None
  private var countCols = 0

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the FILE's column order (the decoder walks serial types in
    // record order); Spark reorders in its own projection
    required = StructType(
      full.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  /** ROWID pushdown (the reference's own access pattern — its
    * `WHERE id IN (?,...)` point lookups): equality / IN / range
    * filters on the rowid-alias column become sorted-disjoint rowid
    * intervals the reader prunes whole b-tree subtrees with (interior
    * pages carry per-child max-rowid separators, so a 1-row lookup
    * reads O(depth) pages — SqliteSourceV2Spec pins it via the
    * pages-visited meter). Pushdown engages ONLY when the stored DDL
    * declares the FIRST column `INTEGER PRIMARY KEY` (the rowid
    * alias: SQLite stores NULL and the value IS the rowid, which is
    * what makes rowid pruning equal value filtering); otherwise every
    * filter stays residual and Spark evaluates them post-scan. */
  /** Equality / IN keys over column `c` — the shape the autoindex
    * serves. Non-string or null values stay residual. */
  private def contentKeysOf(f: org.apache.spark.sql.sources.Filter,
                            c: String): Option[Seq[String]] = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    f match {
      case EqualTo(`c`, s: String) => Some(Seq(s))
      case In(`c`, vs) if vs.nonEmpty && vs.forall(v =>
          v.isInstanceOf[String]) =>
        Some(vs.toSeq.map(_.asInstanceOf[String]))
      case _ => None
    }
  }

  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    val rowidCol = full.fields.headOption
      .filter(_.dataType == LongType).map(_.name)
    // cheap translation check FIRST: the DDL verdicts read the whole
    // head .db on the driver, so only pay them when some filter would
    // actually push (and then once per file version — they're cached)
    val rsup = rowidCol.map(c => filters.filter(f =>
      SqliteSourceV2.filterRanges(f, c).isDefined)).getOrElse(Array())
    val rOk = rsup.nonEmpty &&
      SqliteSourceV2.firstColIsRowidAlias(options)
    if (rOk) rsup.foreach { f =>
      ranges = SqliteSourceV2.intersectRanges(ranges,
        SqliteSourceV2.filterRanges(f, rowidCol.get).get)
    }
    // content-key pushdown: engages only when the head DDL declares a
    // UNIQUE text column with its autoindex present, and a filter is
    // an equality/IN on exactly that column
    val shaped = filters.exists(f => full.fields.drop(1).exists(fl =>
      fl.dataType == StringType && contentKeysOf(f, fl.name).isDefined))
    uniqueCol =
      if (shaped) SqliteSourceV2.uniqueIndexCol(options) else None
    val csup = uniqueCol.map(c => filters.filter(f =>
      contentKeysOf(f, c).isDefined)).getOrElse(Array())
    csup.foreach { f =>
      val ks = contentKeysOf(f, uniqueCol.get).get
      contentKeys = Some(
        contentKeys.map(_.intersect(ks)).getOrElse(ks))
    }
    accepted = (if (rOk) rsup else Array.empty[
      org.apache.spark.sql.sources.Filter]) ++ csup
    filters.filterNot(accepted.contains)
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    accepted

  /** Ungrouped COUNT(*) pushdown (the reference's sync guard —
    * `SELECT COUNT(*)`, server.js:67): each file partition returns
    * its count from b-tree cell counts alone — no payload (or even
    * rowid, on the full range) decode, no overflow chains — and
    * Spark sums the partials (complete pushdown stays off because a
    * directory scan has one partial per file). Composes with the
    * pushed rowid ranges and content keys: a content-keyed count
    * never reads a table page at all. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    false

  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(_.isInstanceOf[CountStar])
    if (ok) countCols = agg.aggregateExpressions.length
    ok
  }

  override def build(): Scan =
    new SqliteScan(full, required,
      Option(options.get("table")).getOrElse("documents"),
      SqliteSourceV2.resolveFiles(options), ranges, contentKeys,
      uniqueCol, countCols)
}

private[graft] class SqliteScan(full: StructType, required: StructType,
                                  table: String, files: Seq[String],
                                  private[graft] val pushedRanges:
                                    IndexedSeq[(Long, Long)],
                                  private[graft] val pushedKeys:
                                    Option[Seq[String]] = None,
                                  uniqueCol: Option[String] = None,
                                  private[graft] val countCols: Int = 0)
    extends Scan with Batch {
  override def readSchema(): StructType =
    if (countCols > 0)
      StructType((0 until countCols).map(i =>
        StructField(s"count$i", LongType, nullable = false)))
    else required
  override def toBatch: Batch = this
  override def description(): String =
    s"SqliteScan(table=$table, files=${files.size}, " +
      s"pushedRowidRanges=${
        if (pushedRanges == SqliteReader.FullRange) "ALL"
        else pushedRanges.mkString(",")}" +
      pushedKeys.map(ks =>
        s", pushedContentKeys=${ks.size}").getOrElse("") +
      (if (countCols > 0) ", PushedAggregation=[COUNT(*)]" else "") +
      ")"
  override def planInputPartitions(): Array[InputPartition] =
    // contradictory pushed filters prune the whole scan at plan time
    // (a pushed COUNT still answers — with 0 — so it keeps its files)
    if (countCols == 0 &&
        (pushedRanges.isEmpty || pushedKeys.exists(_.isEmpty)))
      Array.empty
    else files.map(f => SqliteFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    val ordinals = required.fields
      .map(f => full.fieldIndex(f.name))
    // ship the DRIVER's resolved hadoop conf (incl. session-level
    // spark.hadoop.* — e.g. object-store credentials) to the partition
    // readers: a fresh executor-side Configuration() would list files
    // with one auth on the driver and read them with another in the
    // tasks. Broadcast so N tasks don't each serialize the conf.
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val conf = sc.broadcast(
      new SerializableHadoopConf(SqliteSourceV2.driverHadoopConf()))
    SqliteReaderFactory(table, ordinals, required, conf, pushedRanges,
      pushedKeys, uniqueCol, countCols)
  }
}

private[sources] final case class SqliteFilePartition(path: String)
    extends InputPartition

/** Java-serializable envelope for a hadoop [[Configuration]] (which
  * is Writable, not Serializable) — lets the driver's resolved conf
  * ride a broadcast to the partition readers. Same shape as Spark's
  * own (spark-private) SerializableConfiguration. */
private[sources] final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private[sources] final case class SqliteReaderFactory(
    table: String, ordinals: Array[Int], required: StructType,
    conf: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf],
    ranges: IndexedSeq[(Long, Long)],
    contentKeys: Option[Seq[String]] = None,
    uniqueCol: Option[String] = None,
    countCols: Int = 0)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[SqliteFilePartition].path
    val bytes = SqliteSourceV2.readBytes(path, conf.value.value)
    // pushdown was planned from the HEAD file's DDL; a directory scan
    // may mix files, and pushing rowid ranges (or content keys) into
    // a table whose columns differ would filter by the wrong key and
    // return wrong rows — validate per file, fail loudly
    if (ranges != SqliteReader.FullRange)
      require(SqliteSourceV2.ddlFirstColIsRowidAlias(bytes, table),
        s"sqlite scan: rowid-range pushdown was planned from the " +
          s"head file's DDL, but '$path' table '$table' does not " +
          "declare its first column INTEGER PRIMARY KEY — rowid " +
          "ranges would filter this file by the wrong key; make the " +
          "scanned files' DDLs uniform or drop the rowid filter")
    if (contentKeys.isDefined)
      require(
        SqliteSourceV2.ddlUniqueIndexCol(bytes, table) == uniqueCol,
        s"sqlite scan: content-key pushdown was planned against the " +
          s"head file's UNIQUE column ${uniqueCol.orNull}, but " +
          s"'$path' table '$table' indexes a different column (or " +
          "none) — make the scanned files' DDLs uniform or drop the " +
          "content filter")
    val rows: Iterator[IndexedSeq[Any]] =
      if (countCols > 0) {
        val n = contentKeys match {
          case Some(ks) =>
            SqliteReader.countByContent(bytes, table, ks, ranges)._1
          case None => SqliteReader.countRows(bytes, table, ranges)._1
        }
        Iterator.single(IndexedSeq.fill(countCols)(n))
      } else contentKeys match {
        case Some(ks) =>
          SqliteReader.readTableByContent(bytes, table, ordinals, ks,
            ranges)._1
        case None =>
          SqliteReader.readTableRanges(bytes, table, ordinals,
            ranges)._1
      }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) {
          val vs = rows.next()
          val out = new Array[Any](vs.length)
          var i = 0
          while (i < vs.length) {
            out(i) = vs(i) match {
              case s: String => UTF8String.fromString(s)
              case other => other
            }
            i += 1
          }
          current = InternalRow.fromSeq(out.toIndexedSeq)
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

private[graft] object SqliteSourceV2 {

  /** The driver's RESOLVED hadoop conf — session-level
    * `spark.hadoop.*` options included (what `sessionState
    * .newHadoopConf()` layers on top of the SparkContext conf), so
    * object-store credentials set on the session reach both the
    * listing and (broadcast) the partition readers. */
  def driverHadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  /** Expand `path` (file, directory, or glob) to the .db file list via
    * the Hadoop filesystem — the same resolution `binaryFile` uses, so
    * the DSv2 route and [[Sources.fromSqliteDocumentsRaw]] see the
    * same files. Directory expansion keeps `*.db` only (matching the
    * no-files error text): a stray _SUCCESS / temp file would
    * otherwise be parsed as SQLite and fail the scan with an obscure
    * b-tree error. An EXPLICIT file or glob match is taken as-is —
    * the user named it, so a non-.db extension fails loudly in the
    * header check rather than being silently skipped. */
  def resolveFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "sqlite source: 'path' is required"))
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(driverHadoopConf())
    val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Nil)
    matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".db"))
          .map(_.getPath)
      else Seq(st.getPath)
    }.map(_.toString).sorted
  }

  /** The V1Write body: derive the DDL from the DataFrame schema and
    * hand the whole frame to [[SqliteWriter.writeFull]]. Local paths
    * only (the final single-file stream is a java.io write —
    * `file:`-prefixed URIs are accepted and stripped). */
  def writeLocal(df: org.apache.spark.sql.DataFrame,
                 schema: StructType,
                 options: CaseInsensitiveStringMap): Unit = {
    val rawPath = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "sqlite write: 'path' is required"))
    require(!rawPath.contains("://") || rawPath.startsWith("file:"),
      s"sqlite write: only local paths are supported (got '$rawPath')" +
        " — the single-file final stream is a local java.io write")
    val local = rawPath.stripPrefix("file:")
    val table = Option(options.get("table")).getOrElse("documents")
    val unique = Option(options.get("unique"))
    unique.foreach(u => require(schema.fieldNames.contains(u),
      s"sqlite write: unique column '$u' not in schema " +
        schema.fieldNames.mkString("(", ", ", ")")))
    // the first column BECOMES the INTEGER PRIMARY KEY rowid alias —
    // a non-integral first column would produce a DDL that lies about
    // the data and fail deep inside the page assembler with a cast
    // error; refuse up front with the actual contract instead
    schema.fields.headOption.foreach(f => require(
      f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == ShortType,
      s"sqlite write: the first column ('${f.name}': ${f.dataType
        .simpleString}) must be integral — it becomes the table's " +
        "INTEGER PRIMARY KEY rowid alias; reorder the columns or " +
        "add an id column first"))
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      val t = f.dataType match {
        case LongType | IntegerType | ShortType => "INTEGER"
        case DoubleType | FloatType => "REAL"
        case StringType => "TEXT"
        case BinaryType => "BLOB"
        case other => throw new IllegalArgumentException(
          s"sqlite write: unsupported column type $other for " +
            s"'${f.name}' (INTEGER/REAL/TEXT/BLOB storage classes only)")
      }
      if (i == 0) s"${f.name} INTEGER PRIMARY KEY"
      else s"${f.name} $t" +
        (if (unique.contains(f.name)) " UNIQUE" else "")
    }
    val createSql = s"CREATE TABLE $table (${cols.mkString(", ")})"
    val uniqueIdx = unique.map(schema.fieldIndex)
    uniqueIdx.foreach(i => require(i > 0,
      "sqlite write: the first column is the INTEGER rowid alias and " +
        "cannot carry the UNIQUE text index"))
    val nParts = Option(options.get("numPartitions"))
      .map(_.toInt).getOrElse(4)
    val parent = java.nio.file.Paths.get(local).getParent
    if (parent != null) java.nio.file.Files.createDirectories(parent)
    SqliteWriter.writeFull(df, local,
      SqliteWriter.ExportSchema(table, createSql,
        uniqueTextCol = uniqueIdx, autoincrement = false),
      numPartitions = nParts): Unit
  }

  def readBytes(path: String,
                conf: org.apache.hadoop.conf.Configuration)
      : Array[Byte] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(conf)
    val len = fs.getFileStatus(hp).getLen
    require(len <= Int.MaxValue, s"sqlite file too large: $path")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(hp)
    try in.readFully(0L, buf) finally in.close()
    buf
  }

  private def createSqlOf(bytes: Array[Byte], table: String): String =
    SqliteReader.readTable(bytes, "sqlite_master")
      .collectFirst {
        case r if r.values.lift(0).contains("table") &&
          r.values.lift(1).contains(table) =>
          r.values(4).asInstanceOf[String]
      }
      .getOrElse(throw new NoSuchElementException(
        s"table '$table' not found in sqlite_master"))

  /** The stored DDL's verdict on file `bytes` — shared by the
    * planning-time head-file check and the per-file reader guard. */
  def ddlFirstColIsRowidAlias(bytes: Array[Byte],
                              table: String): Boolean = {
    val sql = createSqlOf(bytes, table)
    val inner = sql.substring(sql.indexOf('(') + 1)
    val first = inner.split(",").head.trim
      .toUpperCase(java.util.Locale.ROOT)
    first.contains("INTEGER") && first.contains("PRIMARY KEY")
  }

  /** The UNIQUE-indexed TEXT column of `table` in file `bytes`, iff
    * its autoindex b-tree is present — the precondition for
    * content-key pushdown (the planned keys descend
    * `sqlite_autoindex_<table>_1`, so the index must exist AND index
    * exactly the filtered column). Shared by the planning-time head
    * check and the per-file reader guard. */
  def ddlUniqueIndexCol(bytes: Array[Byte],
                        table: String): Option[String] = {
    val hasIdx = SqliteReader.readTable(bytes, "sqlite_master")
      .exists(r => r.values.lift(0).contains("index") &&
        r.values.lift(1).contains(s"sqlite_autoindex_${table}_1"))
    if (!hasIdx) None
    else {
      val sql = createSqlOf(bytes, table)
      val inner = sql.substring(sql.indexOf('(') + 1)
      inner.split(",").map(_.trim).collectFirst {
        case d if d.toUpperCase(java.util.Locale.ROOT)
            .split("\\s+").contains("UNIQUE") =>
          d.split("\\s+").head
      }
    }
  }

  /** Planning-time DDL verdicts, keyed by (head file, table, length,
    * mtime) — pushFilters runs once per filtered query, and reading
    * the whole head .db just to parse sqlite_master is driver work
    * worth paying once per file version, not per plan. */
  private val aliasCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Long, Long), Boolean]

  private val uniqueColCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Long, Long), Option[String]]

  /** [[ddlUniqueIndexCol]] on the HEAD resolved file, cached per file
    * version (the [[firstColIsRowidAlias]] discipline). */
  def uniqueIndexCol(options: CaseInsensitiveStringMap)
      : Option[String] = {
    val files = resolveFiles(options)
    if (files.isEmpty) None
    else {
      val table = Option(options.get("table")).getOrElse("documents")
      val conf = driverHadoopConf()
      val hp = new org.apache.hadoop.fs.Path(files.head)
      val st = hp.getFileSystem(conf).getFileStatus(hp)
      uniqueColCache.getOrElseUpdate(
        (files.head, table, st.getLen, st.getModificationTime),
        ddlUniqueIndexCol(readBytes(files.head, conf), table))
    }
  }

  /** True iff the stored DDL declares the FIRST column `INTEGER
    * PRIMARY KEY` — the rowid alias (SQLite stores NULL; the value IS
    * the b-tree rowid), which is the precondition for rowid-range
    * filter pushdown to equal value filtering. Reads the head file's
    * master table (one driver-side read, same as inferSchema; cached
    * per file version). Every OTHER file of a directory scan is
    * re-validated executor-side by the partition reader before its
    * pushed ranges apply. */
  def firstColIsRowidAlias(options: CaseInsensitiveStringMap): Boolean = {
    val files = resolveFiles(options)
    files.nonEmpty && {
      val table = Option(options.get("table")).getOrElse("documents")
      val conf = driverHadoopConf()
      val hp = new org.apache.hadoop.fs.Path(files.head)
      val st = hp.getFileSystem(conf).getFileStatus(hp)
      aliasCache.getOrElseUpdate(
        (files.head, table, st.getLen, st.getModificationTime),
        ddlFirstColIsRowidAlias(readBytes(files.head, conf), table))
    }
  }

  /** Translate one Spark source filter over the rowid-alias column to
    * a sorted-disjoint set of inclusive rowid intervals; None = not
    * translatable (stays residual, Spark evaluates it post-scan). */
  def filterRanges(f: org.apache.spark.sql.sources.Filter,
                   col: String): Option[IndexedSeq[(Long, Long)]] = {
    import org.apache.spark.sql.sources._
    def long(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case _ => None
    }
    f match {
      case EqualTo(`col`, v) => long(v).map(l => IndexedSeq((l, l)))
      case In(`col`, vs) if vs.nonEmpty =>
        val ls = vs.map(long)
        if (ls.exists(_.isEmpty)) None
        else Some(ls.flatten.distinct.sorted.map(l => (l, l))
          .toIndexedSeq)
      case GreaterThan(`col`, v) => long(v).collect {
        case l if l < Long.MaxValue => IndexedSeq((l + 1, Long.MaxValue))
      }
      case GreaterThanOrEqual(`col`, v) =>
        long(v).map(l => IndexedSeq((l, Long.MaxValue)))
      case LessThan(`col`, v) => long(v).collect {
        case l if l > Long.MinValue => IndexedSeq((Long.MinValue, l - 1))
      }
      case LessThanOrEqual(`col`, v) =>
        long(v).map(l => IndexedSeq((Long.MinValue, l)))
      case _ => None
    }
  }

  /** Intersect two sorted-disjoint interval sets (conjunctive filter
    * semantics) — standard two-pointer sweep; may return empty (a
    * contradiction, which prunes the whole scan at plan time). */
  def intersectRanges(a: IndexedSeq[(Long, Long)],
                      b: IndexedSeq[(Long, Long)])
      : IndexedSeq[(Long, Long)] = {
    val out = IndexedSeq.newBuilder[(Long, Long)]
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val lo = math.max(a(i)._1, b(j)._1)
      val hi = math.min(a(i)._2, b(j)._2)
      if (lo <= hi) out += ((lo, hi))
      if (a(i)._2 < b(j)._2) i += 1 else j += 1
    }
    out.result()
  }

  /** Schema from the stored DDL: column clauses between the outer
    * parens, first token = name, second (if any) = type keyword.
    * Table-level constraint clauses (PRIMARY KEY(...), UNIQUE(...),
    * CHECK, FOREIGN KEY) are skipped. */
  def schemaOf(bytes: Array[Byte], table: String): StructType = {
    val createSql = createSqlOf(bytes, table)
    val inner = createSql.substring(createSql.indexOf('(') + 1,
      createSql.lastIndexOf(')'))
    // split on top-level commas (types like DECIMAL(10,2) keep theirs)
    val clauses = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0
      val sb = new StringBuilder
      inner.foreach {
        case '(' => depth += 1; sb += '('
        case ')' => depth -= 1; sb += ')'
        case ',' if depth == 0 => out += sb.toString; sb.clear()
        case c => sb += c
      }
      out += sb.toString
      out.toSeq.map(_.trim).filter(_.nonEmpty)
    }
    val constraintHeads =
      Set("primary", "unique", "check", "foreign", "constraint")
    val fields = clauses.flatMap { cl =>
      val toks = cl.split("\\s+").toSeq
      val name = toks.head.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`")
        .stripPrefix("[").stripSuffix("]")
      if (constraintHeads.contains(name.toLowerCase(
          java.util.Locale.ROOT))) None
      else {
        val tpe = toks.lift(1).map(_.toUpperCase(java.util.Locale.ROOT))
          .getOrElse("")
        // SQLite affinity rules, storage-class-granular
        val dt =
          if (tpe.contains("INT")) LongType
          else if (tpe.contains("CHAR") || tpe.contains("CLOB") ||
            tpe.contains("TEXT")) StringType
          else if (tpe.contains("BLOB")) BinaryType
          else if (tpe.contains("REAL") || tpe.contains("FLOA") ||
            tpe.contains("DOUB")) DoubleType
          else if (tpe.isEmpty) StringType
          else StringType
        Some(StructField(name, dt, nullable = true))
      }
    }
    StructType(fields)
  }
}
