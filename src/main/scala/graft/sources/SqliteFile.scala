package graft.sources

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Pure-JVM read-only SQLite database-file reader — the REAL ingestion
  * face of SURVEY §2 S1 (reference:
  * my_app/sqlite_to_postgres/sqlite_extractor_file.py:13-20, the paged
  * `LIMIT step OFFSET n` extractor with step = 3000 from config.py:11).
  *
  * No sqlite-jdbc jar can exist in this offline sandbox (verified each
  * round), but the driver was only ever one route: the SQLite file format
  * is public and stable (sqlite.org/fileformat2.html), and this engine
  * already decodes eight binary formats from their public specs. This
  * reader implements the subset a table extraction needs, all of it real:
  *
  *  - the 100-byte header (page size, reserved space, UTF-8 text
  *    encoding required);
  *  - the table B-tree: interior pages (type 5, left-child pointers +
  *    rightmost pointer) and leaf pages (type 13, cell pointer arrays);
  *  - varints (1–9 bytes, high-bit continuation, 9th byte full);
  *  - the record format (header of serial types + body): NULL, 1/2/3/4/
  *    6/8-byte big-endian signed ints, 8-byte IEEE double, the 0/1
  *    constants, blobs (even ≥ 12) and UTF-8 text (odd ≥ 13);
  *  - payload OVERFLOW chains (the spec's minLocal/maxLocal spill rule +
  *    linked overflow pages), so a row larger than a page reads intact;
  *  - `sqlite_master` (root at page 1, cells offset by the 100-byte
  *    header) for table roots and CREATE TABLE sql, with a minimal
  *    column parser (quoted identifiers, depth-0 comma split, trailing
  *    table-constraint clauses skipped);
  *  - the rowid-alias rule: an `INTEGER PRIMARY KEY` column stores NULL
  *    in the record and takes the cell's rowid.
  *
  * Scale shape — the Spark face partitions EXACTLY the way the
  * reference's step-3000 paging intends (bounded memory per unit), but
  * in parallel instead of a serial cursor: the driver walks only the
  * INTERIOR pages (fanout-hundreds — a few pages even for huge tables)
  * plus one 8-byte header peek per leaf for its exact cell count, packs
  * leaf pages into partitions of ≤ `stepRows` rows, and each task opens
  * the file and decodes only its own leaves. No LIMIT/OFFSET re-scan
  * per page (the O(n²) the reference's OFFSET paging pays), no driver
  * materialization.
  *
  * Declared-type mapping: INT* → LongType, REAL/FLOA/DOUB → DoubleType,
  * BLOB → BinaryType, everything else (TEXT/uuid/timestamp — SQLite
  * affinity rules collapse them to text here) → StringType, with
  * defensive value coercion since SQLite cells are dynamically typed.
  */
object SqliteFile {

  // ---------- low-level format ----------

  private final class Db(val f: RandomAccessFile) {
    val header = new Array[Byte](100)
    f.seek(0); f.readFully(header)
    require(new String(header, 0, 16, StandardCharsets.ISO_8859_1)
      .startsWith("SQLite format 3"), "not a SQLite 3 database file")
    val pageSize: Int = {
      val raw = ((header(16) & 0xff) << 8) | (header(17) & 0xff)
      if (raw == 1) 65536 else raw
    }
    // the format: a power of two in [512, 65536] — anything else is
    // corruption and every downstream offset would be garbage
    require(pageSize >= 512 && (pageSize & (pageSize - 1)) == 0,
      s"implausible page size $pageSize")
    val reserved: Int = header(20) & 0xff
    val usable: Int = pageSize - reserved
    require(usable >= 480, s"reserved space $reserved leaves no usable page")
    // offsets 18/19 = file-format write/read version: 1 = legacy rollback
    // journal, 2 = WAL (fileformat2 §1.3). A WAL database's latest
    // committed pages may live in the uncheckpointed -wal file, so reading
    // only the main file here would serve STALE rows SILENTLY — the one
    // failure mode of this decoder that would not be loud. Reject by name.
    require((header(18) & 0xff) == 1 && (header(19) & 0xff) == 1,
      s"WAL-journal database (format versions ${header(18) & 0xff}/" +
        s"${header(19) & 0xff}): uncheckpointed pages in the -wal file " +
        "would be silently missed; checkpoint to rollback-journal mode first")
    require(u32(header, 56) == 1L, "only UTF-8 text encoding is supported")

    def page(n: Int): Array[Byte] = {
      val b = new Array[Byte](pageSize)
      f.seek((n - 1).toLong * pageSize); f.readFully(b)
      b
    }
  }

  // bounds-checked primitives: a corrupt offset must fail HERE by name,
  // never as a raw index crash downstream (r14 mutation fuzz)
  private def u16(b: Array[Byte], o: Int): Int = {
    require(o >= 0 && o + 1 < b.length, s"u16 read at $o outside the page")
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  }
  private def u32(b: Array[Byte], o: Int): Long = {
    require(o >= 0 && o + 3 < b.length, s"u32 read at $o outside the page")
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  /** (value, bytesRead) — SQLite varint: up to 8 continuation bytes of 7
    * bits, a 9th byte contributes all 8.
    */
  private def varint(b: Array[Byte], o: Int): (Long, Int) = {
    require(o >= 0, s"varint read at negative offset $o")
    var v = 0L; var i = 0
    while (i < 8) {
      require(o + i < b.length, "varint runs off the page")
      val x = b(o + i) & 0xff
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    require(o + 8 < b.length, "varint runs off the page")
    ((v << 8) | (b(o + 8) & 0xff), 9)
  }

  /** B-tree page header offset: page 1 carries the 100-byte db header. */
  private def hdrOff(pageNo: Int): Int = if (pageNo == 1) 100 else 0

  /** Leaf page numbers of a table b-tree, in key order — interior pages
    * only are touched (type 5: n left-child cells + rightmost pointer).
    */
  private def leafPages(db: Db, root: Int): Vector[Int] =
    leafPagesWalk(db, root, new java.util.HashSet[Int](), depth = 0)

  private def leafPagesWalk(db: Db, root: Int,
                            seen: java.util.HashSet[Int],
                            depth: Int): Vector[Int] = {
    // a corrupt child pointer can form a cycle OR an acyclic chain of
    // fresh pages: both must fail by name, never recurse to a
    // StackOverflowError (a real table b-tree is a handful of levels —
    // fanout hundreds — so 32 is generous)
    require(seen.add(root), s"b-tree page cycle through page $root")
    require(depth <= 32, s"b-tree deeper than 32 levels at page $root")
    val b = db.page(root)
    val off = hdrOff(root)
    (b(off) & 0xff) match {
      case 13 => Vector(root)
      case 5 =>
        val n = u16(b, off + 3)
        val kids = (0 until n).map { i =>
          val cp = u16(b, off + 12 + 2 * i)
          u32(b, cp).toInt
        } :+ u32(b, off + 8).toInt
        kids.toVector.flatMap(leafPagesWalk(db, _, seen, depth + 1))
      // index b-tree pages (2 = interior, 10 = leaf) at a table root mean
      // a WITHOUT ROWID table — its rows live in an index b-tree with a
      // different cell layout, so decoding them as table cells would be
      // garbage. Name the failure rather than leaving a generic type error.
      case 2 | 10 => throw new IllegalArgumentException(
        s"page $root is an index b-tree page: WITHOUT ROWID tables are " +
          "not supported by this reader")
      case t => throw new IllegalArgumentException(
        s"page $root is not a table b-tree page (type $t)")
    }
  }

  /** Full payload of a leaf cell, following the overflow chain when the
    * record spills (fileformat2 §B-tree Pages: maxLocal = U−35,
    * minLocal = (U−12)·32/255 − 23, surplus rule, then a 4-byte next
    * pointer heads each overflow page).
    */
  private def cellPayload(db: Db, page: Array[Byte], cellOff: Int): (Array[Byte], Long) = {
    val (payloadLen, n1) = varint(page, cellOff)
    val (rowid, n2) = varint(page, cellOff + n1)
    // bound by the FILE length, not Int.MaxValue: a corrupt varint must
    // fail here by name, not as a multi-GB allocation (OOM is an Error
    // the fail-loud contract doesn't cover)
    require(payloadLen >= 0 && payloadLen <= db.f.length(),
      s"implausible cell payload length $payloadLen")
    val u = db.usable
    val maxLocal = u - 35
    val local =
      if (payloadLen <= maxLocal) payloadLen.toInt
      else {
        val minLocal = (u - 12) * 32 / 255 - 23
        val k = minLocal + ((payloadLen - minLocal) % (u - 4)).toInt
        if (k > maxLocal) minLocal else k
      }
    require(cellOff + n1 + n2 + local <= page.length,
      "cell's local payload runs off the page")
    val out = new Array[Byte](payloadLen.toInt)
    System.arraycopy(page, cellOff + n1 + n2, out, 0, local)
    var got = local
    if (got < payloadLen) {
      var next = u32(page, cellOff + n1 + n2 + local).toInt
      while (got < payloadLen) {
        require(next != 0, "overflow chain ended before the payload did")
        val op = db.page(next)
        val take = math.min(u - 4, payloadLen.toInt - got)
        System.arraycopy(op, 4, out, got, take)
        got += take
        next = u32(op, 0).toInt
      }
    }
    (out, rowid)
  }

  /** Decode a record payload into column values (serial-type header). */
  private def record(payload: Array[Byte]): Array[Any] = {
    val (hdrLen, n0) = varint(payload, 0)
    // the header length includes its own varint: anything shorter is a
    // corrupt record that would otherwise decode to a silent empty row
    require(hdrLen >= n0, s"record header length $hdrLen shorter than its own varint")
    var ho = n0
    val types = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (ho < hdrLen) {
      val (t, n) = varint(payload, ho); types += t; ho += n
    }
    var bo = hdrLen.toInt
    require(bo >= 0 && bo <= payload.length,
      "record header length exceeds the payload")
    // every read checks the body actually holds what the serial-type
    // header declares — a corrupt header must fail HERE by name, not as
    // an index crash mid-string (caught by the r14 mutation fuzz)
    def take(len: Int): Int = {
      require(bo + len <= payload.length,
        s"record body shorter than its serial-type header declares")
      val at = bo; bo += len; at
    }
    types.map { t =>
      def sint(len: Int): Long = {
        val at = take(len)
        var v = (payload(at).toLong << 56) >> 56 // sign-extend first byte
        var i = 1
        while (i < len) { v = (v << 8) | (payload(at + i) & 0xffL); i += 1 }
        v
      }
      t match {
        case 0 => null
        case 1 => sint(1)
        case 2 => sint(2)
        case 3 => sint(3)
        case 4 => sint(4)
        case 5 => sint(6)
        case 6 => sint(8)
        case 7 => java.lang.Double.longBitsToDouble(sint(8))
        case 8 => 0L
        case 9 => 1L
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          val at = take(len)
          java.util.Arrays.copyOfRange(payload, at, at + len)
        case n if n >= 13 =>
          val len = ((n - 13) / 2).toInt
          val at = take(len)
          new String(payload, at, len, StandardCharsets.UTF_8)
        case n => throw new IllegalArgumentException(s"reserved serial type $n")
      }
    }.toArray
  }

  /** All (rowid, values) of one leaf page. */
  private def leafRows(db: Db, pageNo: Int): Seq[(Long, Array[Any])] = {
    val b = db.page(pageNo)
    val off = hdrOff(pageNo)
    require((b(off) & 0xff) == 13, s"page $pageNo is not a table leaf")
    val n = u16(b, off + 3)
    (0 until n).map { i =>
      val cp = u16(b, off + 8 + 2 * i)
      val (payload, rowid) = cellPayload(db, b, cp)
      (rowid, record(payload))
    }
  }

  // ---------- schema (sqlite_master + CREATE TABLE parse) ----------

  final case class ColumnDef(name: String, declared: String,
                             isRowidAlias: Boolean, hasDefault: Boolean)

  final case class TableDef(name: String, rootPage: Int, sql: String) {
    lazy val columns: Seq[ColumnDef] = parseColumns(sql)
  }

  /** Minimal CREATE TABLE column parser: the parenthesized body split on
    * depth-0 commas; a piece starting with a table-constraint keyword
    * ends the column list; identifiers may be "quoted", `quoted`, or
    * [quoted].
    */
  private[graft] def parseColumns(sql: String): Seq[ColumnDef] = {
    val open = sql.indexOf('(')
    val body = sql.substring(open + 1, sql.lastIndexOf(')'))
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var quote: Char = 0; val cur = new StringBuilder
    // track string/identifier literals: a comma or paren inside
    // '...'/"..."/`...`/[...] (legal in DEFAULT/CHECK clauses) must not
    // split or unbalance the column list (r14 review)
    body.foreach { c =>
      if (quote != 0) {
        cur += c
        if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case '[' => quote = ']'; cur += c
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case other => cur += other
      }
    }
    parts += cur.toString
    val constraintKw = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
      .takeWhile(p => !constraintKw(p.split("[\\s(]+").head.toUpperCase))
      .map { p =>
        val (name, rest) = p.head match {
          case '"' | '`' =>
            val q = p.head; val e = p.indexOf(q, 1)
            (p.substring(1, e), p.substring(e + 1).trim)
          case '[' =>
            val e = p.indexOf(']')
            (p.substring(1, e), p.substring(e + 1).trim)
          case _ =>
            val e = p.indexWhere(_.isWhitespace)
            if (e < 0) (p, "") else (p.substring(0, e), p.substring(e).trim)
        }
        val declared = rest.split("[\\s(]+").headOption.getOrElse("").toUpperCase
        val isRowidAlias = declared == "INTEGER" &&
          rest.toUpperCase.contains("PRIMARY KEY")
        ColumnDef(name, declared, isRowidAlias,
          hasDefault = rest.toUpperCase.contains("DEFAULT"))
      }
  }

  /** sqlite_master rows (type='table'), read from the page-1 b-tree. */
  def tables(path: String): Seq[TableDef] = {
    val f = new RandomAccessFile(path, "r")
    try {
      val db = new Db(f)
      leafPages(db, 1).flatMap(leafRows(db, _)).collect {
        // corrupt sqlite_master records can carry any serial type in any
        // slot: validate by pattern, fail by name — never ClassCastException
        case (_, vals) if vals.length >= 5 && vals(0) == "table" =>
          (vals(1), vals(3), vals(4)) match {
            case (name: String, root: java.lang.Long, sql: String) =>
              TableDef(name, root.toInt, sql)
            case other => throw new IllegalArgumentException(
              s"malformed sqlite_master table row: $other")
          }
      }
    } finally f.close()
  }

  // ---------- Spark face ----------

  private def sparkType(declared: String): DataType = declared match {
    case d if d.contains("INT") => LongType
    case "REAL" | "FLOAT" | "FLOA" | "DOUBLE" | "DOUB" | "NUMERIC" => DoubleType
    case "BLOB" => BinaryType
    case _ => StringType
  }

  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, LongType) => l
    case (l: Long, DoubleType) => l.toDouble
    case (d: Double, DoubleType) => d
    case (l: Long, StringType) => l.toString
    case (d: Double, StringType) => d.toString
    case (s: String, StringType) => s
    case (b: Array[Byte], BinaryType) => b
    case (other, _) => throw new IllegalArgumentException(
      s"cell value ${other.getClass.getSimpleName} does not fit declared $dt")
  }

  /** WITHOUT ROWID tables keep their rows in an index b-tree (different
    * cell layout, no rowid column) — reject from the declared table
    * options (the text AFTER the closing paren of the column list, so a
    * string literal inside a column definition can never false-positive),
    * before any page is read; the page-type walk backstops this for a
    * schema row that lies about its options.
    */
  private[graft] def requireRowidLayout(table: String, sql: String): Unit =
    require("(?i)\\bWITHOUT\\s+ROWID\\b".r
      .findFirstIn(sql.substring(sql.lastIndexOf(')') + 1)).isEmpty,
      s"'$table' is a WITHOUT ROWID table: its rows live in an index " +
        "b-tree this reader does not decode")

  /** Read one table as a DataFrame, partitioned at the reference's
    * step-3000 granularity: leaf pages packed into partitions of at most
    * `stepRows` rows (exact per-leaf cell counts from an 8-byte header
    * peek), each task decoding only its own pages.
    */
  def read(spark: SparkSession, path: String, table: String,
           stepRows: Int = 3000): DataFrame = {
    require(stepRows >= 1, "stepRows must be positive")
    val t = tables(path).find(_.name == table).getOrElse(
      throw new IllegalArgumentException(s"no table '$table' in $path"))
    require(t.rootPage >= 1,
      s"'$table' has no b-tree root (rootpage ${t.rootPage}): virtual " +
        "tables and views hold no rows to read")
    requireRowidLayout(table, t.sql)
    val cols = t.columns
    val schema = StructType(cols.map(c =>
      StructField(c.name, sparkType(c.declared), nullable = true)))
    val types = cols.map(c => sparkType(c.declared)).toArray
    val rowidIdx = cols.indexWhere(_.isRowidAlias)
    // rows written BEFORE an ALTER TABLE ADD COLUMN store short records;
    // the format's rule is to substitute the added column's default. A
    // missing value with no DEFAULT clause is exactly NULL; one WITH a
    // DEFAULT would need the literal materialized — fail loud rather
    // than silently misreading it as NULL (r14 review)
    val defaultedTail = cols.map(_.hasDefault).toArray
    // driver: interior walk + one cell-count peek per leaf, then pack
    val (leaves, counts) = {
      val f = new RandomAccessFile(path, "r")
      try {
        val db = new Db(f)
        val ls = leafPages(db, t.rootPage)
        val ns = ls.map { p =>
          val b = new Array[Byte](8)
          f.seek((p - 1).toLong * db.pageSize + hdrOff(p)); f.readFully(b)
          u16(b, 3)
        }
        (ls, ns)
      } finally f.close()
    }
    // page-granular packing: a chunk closes at stepRows, but one leaf is
    // never split, so a partition holds ≤ max(stepRows, one leaf's cells)
    // rows — memory stays page-bounded either way (r14 review: the
    // stronger "≤ stepRows always" claim was false for huge-page files)
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Vector[Int]]
    var cur = Vector.empty[Int]; var n = 0
    leaves.zip(counts).foreach { case (p, c) =>
      if (cur.nonEmpty && n + c > stepRows) { chunks += cur; cur = Vector.empty; n = 0 }
      cur :+= p; n += c
    }
    if (cur.nonEmpty) chunks += cur
    val parts = if (chunks.isEmpty) Seq(Vector.empty[Int]) else chunks.toSeq
    val rdd = spark.sparkContext
      .parallelize(parts, parts.size)
      .mapPartitions { it =>
        it.flatMap { pages =>
          if (pages.isEmpty) Iterator.empty
          else {
            val f = new RandomAccessFile(path, "r")
            try { // close on the decode-failure path too (r14 review)
              val db = new Db(f)
              pages.iterator.flatMap(leafRows(db, _)).map {
                case (rowid, vals) =>
                  Row.fromSeq(types.indices.map { i =>
                    if (i == rowidIdx) rowid
                    else if (i < vals.length) coerce(vals(i), types(i))
                    else if (defaultedTail(i)) throw new IllegalArgumentException(
                      s"short record omits column '${cols(i).name}' which " +
                        "declares a DEFAULT — materializing defaults is unsupported")
                    else null // pre-ALTER row, no default: NULL by the format
                  })
              }.toVector // one chunk: ≤ max(stepRows, one leaf) rows
            } finally f.close()
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
