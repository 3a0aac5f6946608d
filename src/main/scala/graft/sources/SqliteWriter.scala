package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Distributed writer for the SQLite database file format (format 3,
  * sqlite.org/fileformat2) — the inverse of [[SqliteReader]], closing
  * the reference's store loop in BOTH directions: the engine can read
  * a reference-style `vectors.db` (reference server.js:21-32) AND
  * export one a stock `sqlite3` opens, so a user migrating either way
  * never leaves the library.
  *
  * Scope mirrors the reader: ONE rowid table per file, written fresh
  * (no update path), serial types for null/int/real/text/blob,
  * overflow chains for records past the local-payload threshold (the
  * reference's 6144-byte float32 blobs always overflow a 4096-byte
  * page), multi-level interior B-trees. Deliberately NOT written:
  * indexes and constraint enforcement — uniqueness is the ingest
  * path's job in this engine (the i02 dedup-upsert), so the exported
  * schema carries the columns, not the reference's `UNIQUE` clause
  * (which would obligate an index B-tree for stock-sqlite validity);
  * freelists/WAL/pointer maps don't occur in a fresh single-pass file.
  *
  * Distribution: SQLite is a single-FILE format, so the final byte
  * stream is inherently one writer — but everything CPU-shaped is
  * executor-side. Rows are range-partitioned by rowid (a table B-tree
  * is rowid-ordered, so ranged partitions own contiguous leaf runs),
  * each partition serializes its own leaf + overflow pages with
  * page numbers LOCAL to the partition (pointer fields carry local
  * indexes plus a fix-up list), a count-only job turns partition page
  * counts into global base offsets, and the driver then streams
  * pages to disk in partition order, patching each fix-up to
  * `base + local` as the bytes pass through — O(page) driver memory,
  * zero driver-side record encoding. Interior levels are built
  * driver-side from the (leaf page number, max rowid) directory:
  * O(leaves) entries ≈ file_bytes / 4 KiB — model-sized for the
  * export/migration workloads a single .db file can serve at all
  * (this is the migration seam, not the 100 TB store: the operational
  * sink remains the parquet/manifest store, exactly as the reader is
  * the one-time migration scan).
  */
object SqliteWriter {

  val PageSize = 4096
  /** No reserved bytes per page → the full page is usable. */
  val Usable: Int = PageSize

  /** What a write produced — surfaced so specs and call sites can
    * assert the tree SHAPE (overflow exercised, interior depth), not
    * just re-read the rows. */
  final case class WriteStats(rows: Long, dataPages: Long,
                              overflowPages: Long, interiorPages: Int,
                              levels: Int, rootPage: Long)

  // ---- varints (big-endian 7-bit groups, 9th byte carries 8) -------

  private[graft] def varintLen(v: Long): Int = {
    if (v < 0) return 9 // sign bit set → full 9-byte form
    var n = 1
    var x = v >>> 7
    while (x != 0 && n < 8) { n += 1; x >>>= 7 }
    if (x != 0) 9 else n
  }

  /** Write the varint for `v` at `off`; returns bytes written. */
  private[graft] def putVarint(b: Array[Byte], off: Int, v: Long): Int = {
    val n = varintLen(v)
    if (n == 9) {
      var i = 0
      while (i < 8) { // 8 groups of 7 from the TOP bits
        b(off + i) = (0x80 | ((v >>> (57 - 7 * i)) & 0x7f)).toByte
        i += 1
      }
      b(off + 8) = (v & 0xff).toByte
    } else {
      var i = 0
      while (i < n) {
        val shift = 7 * (n - 1 - i)
        val g = ((v >>> shift) & 0x7f).toInt
        b(off + i) = (if (i < n - 1) (g | 0x80) else g).toByte
        i += 1
      }
    }
    n
  }

  // ---- record (row payload) encoding --------------------------------

  /** Serial type + body length for one value (schema format 1 types
    * only — 0/1 ride 1-byte ints so the file stays readable by every
    * format-aware tool, not just format-4 ones). */
  private def serialOf(v: Any): (Long, Int) = v match {
    case null => (0L, 0)
    case l: Long =>
      if (l >= -128 && l <= 127) (1L, 1)
      else if (l >= -32768 && l <= 32767) (2L, 2)
      else if (l >= -8388608 && l <= 8388607) (3L, 3)
      else if (l >= Int.MinValue && l <= Int.MaxValue) (4L, 4)
      else if (l >= -140737488355328L && l <= 140737488355327L) (5L, 6)
      else (6L, 8)
    case _: Double => (7L, 8)
    case s: String =>
      val n = s.getBytes("UTF-8").length; (13L + 2L * n, n)
    case b: Array[Byte] => (12L + 2L * b.length, b.length)
    case other => throw new IllegalArgumentException(
      s"unsupported SQLite value type: ${other.getClass.getName}")
  }

  private def putBody(out: Array[Byte], off0: Int, v: Any, len: Int): Int = {
    var off = off0
    v match {
      case null => ()
      case l: Long =>
        var i = len - 1
        while (i >= 0) { out(off + (len - 1 - i)) = ((l >>> (8 * i)) & 0xff).toByte; i -= 1 }
        off += len
      case d: Double =>
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 7
        while (i >= 0) { out(off + (7 - i)) = ((bits >>> (8 * i)) & 0xff).toByte; i -= 1 }
        off += 8
      case s: String =>
        val b = s.getBytes("UTF-8")
        System.arraycopy(b, 0, out, off, b.length); off += b.length
      case b: Array[Byte] =>
        System.arraycopy(b, 0, out, off, b.length); off += b.length
    }
    off
  }

  /** One record payload: varint header-length, serial-type varints,
    * then the bodies in order. */
  private[sources] def encodeRecord(values: IndexedSeq[Any]): Array[Byte] = {
    val st = values.map(serialOf)
    val typesLen = st.map(t => varintLen(t._1)).sum
    // header length includes its own varint; its varint width can grow
    // the length it encodes — iterate to the fixed point
    var hdrLen = typesLen + 1
    while (varintLen(hdrLen.toLong) + typesLen != hdrLen)
      hdrLen = varintLen(hdrLen.toLong) + typesLen
    val total = hdrLen + st.map(_._2).sum
    val out = new Array[Byte](total)
    var off = putVarint(out, 0, hdrLen.toLong)
    st.foreach { case (t, _) => off += putVarint(out, off, t) }
    values.iterator.zip(st.iterator).foreach { case (v, (_, len)) =>
      off = putBody(out, off, v, len)
    }
    out
  }

  // ---- executor-side page assembly ----------------------------------

  /** One serialized page, numbered locally within its partition.
    * `fixups` are offsets of 4-byte big-endian fields currently
    * holding a LOCAL page index; the final file patches each to
    * `partitionBasePageNo + localIndex`. `maxRowid` is set on leaf
    * pages only — the interior-building directory. */
  final case class LocalPage(localIdx: Int, bytes: Array[Byte],
                             fixups: Array[Int], isLeaf: Boolean,
                             maxRowid: Long)

  private final case class Cell(bytes: Array[Byte], fixupInCell: Int)

  /** Serialize one partition's rowid-ascending rows into leaf +
    * overflow pages. Streaming: buffers one open leaf (its cells and
    * their overflow pages) at a time. */
  private[sources] final class PartitionPager(
      rows: Iterator[(Long, IndexedSeq[Any])])
    extends Iterator[LocalPage] {

    private val out = scala.collection.mutable.Queue.empty[LocalPage]
    private var nextLocal = 0
    // open-leaf state
    private var leafIdx = -1
    private val cells = ArrayBuffer.empty[Cell]
    private var cellBytes = 0
    private var leafMax = Long.MinValue
    private val leafOverflow = ArrayBuffer.empty[LocalPage]
    private var lastRowid = Long.MinValue

    private def openLeaf(): Unit = {
      leafIdx = nextLocal; nextLocal += 1
      cells.clear(); cellBytes = 0
      leafMax = Long.MinValue; leafOverflow.clear()
    }

    private def flushLeaf(): Unit = {
      val n = cells.length
      val page = new Array[Byte](PageSize)
      page(0) = 0x0d
      page(3) = ((n >>> 8) & 0xff).toByte; page(4) = (n & 0xff).toByte
      var content = Usable
      val fixups = ArrayBuffer.empty[Int]
      var i = 0
      while (i < n) {
        val c = cells(i)
        content -= c.bytes.length
        System.arraycopy(c.bytes, 0, page, content, c.bytes.length)
        page(8 + 2 * i) = ((content >>> 8) & 0xff).toByte
        page(9 + 2 * i) = (content & 0xff).toByte
        if (c.fixupInCell >= 0) fixups += content + c.fixupInCell
        i += 1
      }
      page(5) = ((content >>> 8) & 0xff).toByte
      page(6) = (content & 0xff).toByte
      out += LocalPage(leafIdx, page, fixups.toArray, isLeaf = true, leafMax)
      leafOverflow.foreach(out += _)
      leafIdx = -1
    }

    /** Local-payload split per the documented thresholds (the exact
      * formulas [[SqliteReader.readLeafCell]] inverts). */
    private def localLen(p: Int): Int = {
      val maxLocal = Usable - 35
      if (p <= maxLocal) p
      else {
        val minLocal = (Usable - 12) * 32 / 255 - 23
        val k = minLocal + (p - minLocal) % (Usable - 4)
        if (k > maxLocal) minLocal else k
      }
    }

    private def addRow(rowid: Long, values: IndexedSeq[Any]): Unit = {
      require(rowid > lastRowid,
        s"rowids must be strictly increasing within the sorted input " +
          s"(saw $rowid after $lastRowid) — duplicate or unsorted keys " +
          "would produce a malformed B-tree")
      lastRowid = rowid
      val payload = encodeRecord(values)
      val local = localLen(payload.length)
      val overflows = local < payload.length
      val cellLen = varintLen(payload.length.toLong) + varintLen(rowid) +
        local + (if (overflows) 4 else 0)
      if (leafIdx < 0) openLeaf()
      else if (8 + 2 * (cells.length + 1) + cellBytes + cellLen > Usable) {
        flushLeaf(); openLeaf()
      }
      val cell = new Array[Byte](cellLen)
      var off = putVarint(cell, 0, payload.length.toLong)
      off += putVarint(cell, off, rowid)
      System.arraycopy(payload, 0, cell, off, local)
      var fixupInCell = -1
      if (overflows) {
        fixupInCell = off + local
        var written = local
        var prevPtrPage = -1 // -1 → pointer lives in the cell
        var prevPtrOff = fixupInCell
        while (written < payload.length) {
          val idx = nextLocal; nextLocal += 1
          // patch the PREVIOUS pointer to this page's local index
          val target = if (prevPtrPage < 0) cell
                       else leafOverflow(prevPtrPage).bytes
          target(prevPtrOff) = ((idx >>> 24) & 0xff).toByte
          target(prevPtrOff + 1) = ((idx >>> 16) & 0xff).toByte
          target(prevPtrOff + 2) = ((idx >>> 8) & 0xff).toByte
          target(prevPtrOff + 3) = (idx & 0xff).toByte
          val pg = new Array[Byte](PageSize)
          val take = math.min(Usable - 4, payload.length - written)
          System.arraycopy(payload, written, pg, 4, take)
          written += take
          // next-pointer: 0 (end of chain) unless another page follows,
          // in which case the next iteration patches offset 0
          leafOverflow += LocalPage(idx, pg, fixups = Array(0),
            isLeaf = false, maxRowid = Long.MinValue)
          prevPtrPage = leafOverflow.length - 1
          prevPtrOff = 0
        }
        // the LAST overflow page's next-pointer is a true zero, not a
        // local index — drop its fix-up so the patch pass leaves it
        val last = leafOverflow.length - 1
        leafOverflow(last) = leafOverflow(last).copy(fixups = Array.empty)
      }
      cells += Cell(cell, fixupInCell)
      cellBytes += cellLen
      leafMax = math.max(leafMax, rowid)
    }

    // a partition with zero rows contributes zero pages (the driver
    // emits the one empty root leaf itself when the whole table is
    // empty)
    override def hasNext: Boolean = {
      while (out.isEmpty && rows.hasNext) {
        val (rid, vs) = rows.next()
        addRow(rid, vs)
        if (!rows.hasNext && leafIdx >= 0) flushLeaf()
      }
      out.nonEmpty
    }

    override def next(): LocalPage = {
      if (!hasNext) throw new NoSuchElementException("no more pages")
      out.dequeue()
    }
  }

  // ---- driver-side assembly ------------------------------------------

  private def u16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 8) & 0xff).toByte; b(off + 1) = (v & 0xff).toByte
  }
  private def u32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte
    b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }

  /** One leaf page holding `cells` (pre-serialized, non-overflowing),
    * with the 100-byte file header carved out when `isPage1`. */
  private def leafPageOf(cellsB: Seq[Array[Byte]], isPage1: Boolean)
      : Array[Byte] = {
    val page = new Array[Byte](PageSize)
    val hdr = if (isPage1) 100 else 0
    page(hdr) = 0x0d
    u16(page, hdr + 3, cellsB.length)
    var content = Usable
    cellsB.zipWithIndex.foreach { case (c, i) =>
      content -= c.length
      System.arraycopy(c, 0, page, content, c.length)
      u16(page, hdr + 8 + 2 * i, content)
    }
    u16(page, hdr + 5, content) // 4096-B pages: start always fits u16
    page
  }

  /** Interior level over `children` = (pageNo, maxRowid) in key order:
    * packs (4-byte child, varint maxRowid) cells, last child to the
    * right-most header pointer. Returns the level's pages paired with
    * their own (pageNo, maxRowid), page numbers allocated from
    * `firstPageNo`. */
  private def interiorLevel(children: IndexedSeq[(Long, Long)],
                            firstPageNo: Long)
      : (IndexedSeq[Array[Byte]], IndexedSeq[(Long, Long)]) = {
    // split into groups first (each ≥2 children, fitting one page),
    // then serialize — two passes over an O(pages) directory, and a
    // trailing lone child is rebalanced by borrowing from its left
    // neighbor instead of patching serialized bytes
    val groups = ArrayBuffer.empty[ArrayBuffer[(Long, Long)]]
    var cur = ArrayBuffer.empty[(Long, Long)]
    var cellBytes = 0
    children.foreach { case c @ (_, maxKey) =>
      val len = 4 + varintLen(maxKey)
      // conservative: charges the right-most child a phantom cell slot
      if (cur.length >= 2 &&
          12 + 2 * (cur.length + 1) + cellBytes + len > Usable) {
        groups += cur; cur = ArrayBuffer.empty; cellBytes = 0
      }
      cur += c; cellBytes += len
    }
    if (cur.nonEmpty) groups += cur
    if (groups.length > 1 && groups.last.length == 1)
      groups.last.prepend(
        groups(groups.length - 2).remove(groups(groups.length - 2).length - 1))
    val pages = groups.zipWithIndex.map { case (group, _) =>
      val page = new Array[Byte](PageSize)
      page(0) = 0x05
      val cells = group.init
      u16(page, 3, cells.length)
      u32(page, 8, group.last._1) // right-most child
      var content = Usable
      cells.zipWithIndex.foreach { case ((child, maxKey), i) =>
        val len = 4 + varintLen(maxKey)
        content -= len
        u32(page, content, child)
        putVarint(page, content + 4, maxKey): Unit
        u16(page, 12 + 2 * i, content)
      }
      u16(page, 5, content) // 4096-B pages: start always fits u16
      page
    }
    val dir = groups.zipWithIndex.map { case (group, i) =>
      (firstPageNo + i, group.last._2)
    }
    (pages.toIndexedSeq, dir.toIndexedSeq)
  }

  /** sqlite_master record for the one exported table. */
  private def masterCell(table: String, rootPage: Long, sql: String)
      : Array[Byte] = {
    val rec = encodeRecord(IndexedSeq("table", table, table, rootPage, sql))
    require(rec.length <= Usable - 35 - 100,
      s"schema record (${rec.length} B) would overflow page 1 — " +
        "shorten the CREATE TABLE statement")
    val cell = new Array[Byte](varintLen(rec.length.toLong) +
      varintLen(1L) + rec.length)
    var off = putVarint(cell, 0, rec.length.toLong)
    off += putVarint(cell, off, 1L)
    System.arraycopy(rec, 0, cell, off, rec.length)
    cell
  }

  private def fileHeader(dbPages: Long): Array[Byte] = {
    val h = new Array[Byte](100)
    System.arraycopy("SQLite format 3 ".getBytes("ISO-8859-1"), 0, h, 0, 16)
    u16(h, 16, PageSize)
    h(18) = 1; h(19) = 1            // legacy (rollback-journal) versions
    h(20) = 0                        // reserved bytes per page
    h(21) = 64; h(22) = 32; h(23) = 32
    u32(h, 24, 1L)                   // file change counter
    u32(h, 28, dbPages)              // database size in pages
    u32(h, 40, 1L)                   // schema cookie
    u32(h, 44, 1L)                   // schema format 1 (max compat)
    u32(h, 56, 1L)                   // text encoding: UTF-8
    u32(h, 92, 1L)                   // version-valid-for == change counter
    u32(h, 96, 3045000L)             // library version stamp
    h
  }

  /** Convert a Spark row to the writer's value model per the schema
    * (first column = rowid, written as the B-tree key; when
    * `rowidAlias`, the record stores NULL there and readers surface
    * the rowid — SQLite's own INTEGER PRIMARY KEY layout). */
  private def rowValues(r: Row, types: Array[DataType],
                        rowidAlias: Boolean): (Long, IndexedSeq[Any]) = {
    val rid = types(0) match {
      case LongType => r.getLong(0)
      case IntegerType => r.getInt(0).toLong
      case t => throw new IllegalArgumentException(
        s"rowid column must be integral, got $t")
    }
    val vs = new Array[Any](types.length)
    vs(0) = if (rowidAlias) null else rid
    var i = 1
    while (i < types.length) {
      vs(i) =
        if (r.isNullAt(i)) null
        else types(i) match {
          case LongType => r.getLong(i)
          case IntegerType => r.getInt(i).toLong
          case ShortType => r.getShort(i).toLong
          case DoubleType => r.getDouble(i)
          case FloatType => r.getFloat(i).toDouble
          case StringType => r.getString(i)
          case BinaryType => r.getAs[Array[Byte]](i)
          case t => throw new IllegalArgumentException(
            s"unsupported column type for SQLite export: $t")
        }
      i += 1
    }
    (rid, vs.toIndexedSeq)
  }

  /** Export `df` (first column = unique integral rowid) as a fresh
    * SQLite file at local path `out`. Returns [[WriteStats]].
    *
    * `numPartitions` sizes the executor-side page-assembly fan-out;
    * the final stream write is single-file by format necessity.
    */
  def write(df: DataFrame, out: String, table: String, createSql: String,
            numPartitions: Int = 4, rowidAlias: Boolean = true)
      : WriteStats = {
    import org.apache.spark.sql.functions.col
    val types = df.schema.fields.map(_.dataType)
    val rowidCol = df.schema.fields.head.name
    val prepared = df
      .repartitionByRange(numPartitions, col(rowidCol))
      .sortWithinPartitions(rowidCol)
    val pages = prepared.rdd.mapPartitions { it =>
      new PartitionPager(it.map(rowValues(_, types, rowidAlias)))
    }
    pages.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // one count-only pass → partition page counts → global bases
      val counts = pages.mapPartitionsWithIndex { (i, it) =>
        var n = 0L; var rows = 0L
        it.foreach { p => n += 1; if (p.isLeaf) rows += countCells(p.bytes) }
        Iterator((i, n, rows))
      }.collect().sortBy(_._1)
      val nParts = counts.length
      val bases = new Array[Long](nParts)
      var acc = 2L // data pages start right after page 1
      counts.foreach { case (i, n, _) => bases(i) = acc; acc += n }
      val totalData = acc - 2
      val totalRows = counts.map(_._3).sum
      // (leaf pageNo, maxRowid) directory, partition order = key order
      val leafDir: IndexedSeq[(Long, Long)] = pages
        .mapPartitionsWithIndex { (i, it) =>
          it.filter(_.isLeaf).map(p => (i, p.localIdx, p.maxRowid))
        }.collect().sortBy(t => (t._1, t._2))
        .map { case (i, li, mr) => (bases(i) + li, mr) }.toIndexedSeq

      val interiors = ArrayBuffer.empty[Array[Byte]]
      var levels = 1
      var rootPage = 1L + totalData // provisional: single-leaf case
      var emptyRootLeaf: Option[Array[Byte]] = None
      if (leafDir.isEmpty) {
        emptyRootLeaf = Some(leafPageOf(Nil, isPage1 = false))
        rootPage = 2L
      } else if (leafDir.length == 1) {
        rootPage = leafDir.head._1
      } else {
        var level = leafDir
        var nextNo = 2L + totalData
        while (level.length > 1) {
          val (pgs, dir) = interiorLevel(level, nextNo)
          interiors ++= pgs
          nextNo += pgs.length
          level = dir
          levels += 1
        }
        rootPage = level.head._1
      }
      val dbPages = 1L + totalData +
        (if (emptyRootLeaf.isDefined) 1L else interiors.length.toLong)

      val os = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(out), 1 << 16)
      try {
        // page 1: file header + sqlite_master leaf
        val p1 = leafPageOf(Seq(masterCell(table, rootPage, createSql)),
          isPage1 = true)
        System.arraycopy(fileHeader(dbPages), 0, p1, 0, 100)
        os.write(p1)
        // data pages stream through in partition order; every fix-up
        // is patched local → global as the bytes pass. toLocalIterator
        // yields partitions in index order, so the owning partition of
        // the page at global number `expect` is found by advancing a
        // cursor past finished (or empty — end == base) partitions.
        var expect = 2L
        val partEnds = bases.zip(counts.map(_._2)).map { case (b, n) => b + n }
        var pi = 0
        pages.toLocalIterator.foreach { p =>
          while (pi < nParts - 1 && expect >= partEnds(pi)) pi += 1
          val base = bases(pi)
          val no = base + p.localIdx
          assert(no == expect,
            s"page stream out of order: expected page $expect, got $no")
          p.fixups.foreach { off =>
            val local = ((p.bytes(off) & 0xff).toLong << 24) |
              ((p.bytes(off + 1) & 0xff) << 16) |
              ((p.bytes(off + 2) & 0xff) << 8) | (p.bytes(off + 3) & 0xff)
            u32(p.bytes, off, base + local)
          }
          os.write(p.bytes)
          expect += 1
        }
        require(expect == 2L + totalData,
          s"wrote ${expect - 2} data pages, expected $totalData")
        emptyRootLeaf.foreach(os.write)
        interiors.foreach(os.write)
      } finally os.close()
      WriteStats(totalRows, totalData, {
        // overflow pages = data pages - leaves
        totalData - leafDir.length
      }, if (emptyRootLeaf.isDefined) 0 else interiors.length,
        levels, rootPage)
    } finally { pages.unpersist(); () }
  }

  private def countCells(leaf: Array[Byte]): Long =
    (((leaf(3) & 0xff) << 8) | (leaf(4) & 0xff)).toLong
}
