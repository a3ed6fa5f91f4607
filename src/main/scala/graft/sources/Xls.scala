package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S3 (legacy half) — binary `.xls` (BIFF8) ingestion with the same
  * all-strings semantics as [[Xlsx]] (reference
  * lib/id3c/cli/io/pandas.py:48-133 loads both `.xls` and `.xlsx`
  * through `read_excel`, every cell cast to string). JDK-only, like the
  * rest of graft's sources: a minimal CFB (OLE2 compound file) reader
  * finds the `Workbook` stream, then a BIFF8 record parser extracts the
  * shared-string table (including CONTINUE-record splits), the sheet
  * directory, and the cell records.
  *
  * Like the xlsx path, parsing happens on the driver — manifests are
  * dimension-scale inputs, not fact tables — and the resulting frame is
  * distributed for downstream QC joins.
  *
  * Record coverage (the set real-world manifest workbooks exercise):
  * BOUNDSHEET, SST/CONTINUE, LABELSST, LABEL, NUMBER, RK, MULRK,
  * BOOLERR, FORMULA with cached numeric/string/bool results (+ STRING).
  * BLANK/MULBLANK cells stay null. Whole numbers render without a
  * trailing ".0", mirroring the lexical form Excel itself stores for
  * integer cells in xlsx — the two readers agree on the same workbook
  * saved in either format.
  */
object Xls {

  private final val ENDOFCHAIN = 0xFFFFFFFEL
  private final val FREESECT = 0xFFFFFFFFL

  // ---- little-endian primitives over a byte array ---------------------
  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def u16(b: Array[Byte], o: Int): Int = u8(b, o) | (u8(b, o + 1) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o) | (u16(b, o + 2).toLong << 16)) & 0xFFFFFFFFL
  private def f64(b: Array[Byte], o: Int): Double =
    java.lang.Double.longBitsToDouble(
      (0 until 8).foldLeft(0L)((acc, i) => acc | ((b(o + i) & 0xffL) << (8 * i))))

  /** CFB container → named streams (top-level only; workbooks keep the
    * BIFF stream at the root). Follows the regular FAT, the DIFAT
    * extension chain, and the mini FAT for streams below the cutoff.
    */
  private[sources] def cfbStreams(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    require(bytes.length >= 512 &&
      u32(bytes, 0) == 0xE011CFD0L && u32(bytes, 4) == 0xE11AB1A1L,
      "not a CFB (OLE2) file")
    val sectorSize = 1 << u16(bytes, 30)
    val miniSize = 1 << u16(bytes, 32)
    val miniCutoff = u32(bytes, 56)
    def sector(i: Long): Array[Byte] = {
      val off = ((i + 1) * sectorSize).toInt
      java.util.Arrays.copyOfRange(bytes, off, math.min(off + sectorSize, bytes.length))
    }
    // FAT sector list: 109 header DIFAT entries, then chained DIFAT sectors
    val fatSectors = mutable.Buffer[Long]()
    for (i <- 0 until 109) {
      val s = u32(bytes, 76 + 4 * i)
      if (s != FREESECT && s != ENDOFCHAIN) fatSectors += s
    }
    var difat = u32(bytes, 68)
    while (difat != ENDOFCHAIN && difat != FREESECT) {
      val d = sector(difat)
      for (i <- 0 until sectorSize / 4 - 1) {
        val s = u32(d, 4 * i)
        if (s != FREESECT && s != ENDOFCHAIN) fatSectors += s
      }
      difat = u32(d, sectorSize - 4)
    }
    val fat: IndexedSeq[Long] =
      fatSectors.toIndexedSeq.flatMap(s => (0 until sectorSize / 4)
        .map(i => u32(sector(s), 4 * i)))
    def chain(start: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != ENDOFCHAIN && s != FREESECT && guard <= fat.length) {
        out.write(sector(s)); s = fat(s.toInt); guard += 1
      }
      out.toByteArray
    }
    // directory entries (128 bytes each)
    val dir = chain(u32(bytes, 48))
    case class Entry(name: String, objType: Int, start: Long, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dir, o + 64) // bytes incl. UTF-16 terminator
      val name = new String(dir, o, math.max(0, nameLen - 2), "UTF-16LE")
      Entry(name, u8(dir, o + 66), u32(dir, o + 116), u32(dir, o + 120))
    }
    val root = entries.find(_.objType == 5)
      .getOrElse(sys.error("CFB root entry missing"))
    lazy val miniStream = chain(root.start)
    lazy val miniFat: IndexedSeq[Long] = {
      val mf = chain(u32(bytes, 60))
      (0 until mf.length / 4).map(i => u32(mf, 4 * i))
    }
    def miniChain(start: Long, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != ENDOFCHAIN && s != FREESECT && guard <= miniFat.length) {
        val off = (s * miniSize).toInt
        out.write(miniStream, off, math.min(miniSize, miniStream.length - off))
        s = miniFat(s.toInt); guard += 1
      }
      out.toByteArray.take(size.toInt)
    }
    entries.filter(_.objType == 2).map { e =>
      val data =
        // sub-cutoff streams live in the mini stream; fall back to the
        // regular FAT for spec-bending writers that chain them there
        if (e.size < miniCutoff && miniStream.nonEmpty && miniFat.nonEmpty)
          miniChain(e.start, e.size)
        else chain(e.start).take(e.size.toInt)
      e.name -> data
    }.toMap
  }

  /** Cursor over a record's payload plus its CONTINUE payloads. Plain
    * fields read across segment boundaries transparently; character
    * runs re-read the compression flag at each boundary (the BIFF8
    * continued-string rule).
    */
  private final class Segments(segs: IndexedSeq[Array[Byte]]) {
    private var si = 0
    private var off = 0
    private def ensure(): Unit =
      while (si < segs.length && off >= segs(si).length) { si += 1; off = 0 }
    def hasMore: Boolean = { ensure(); si < segs.length }
    def byte(): Int = { ensure(); val v = u8(segs(si), off); off += 1; v }
    def word(): Int = byte() | (byte() << 8)
    def dword(): Long = (word() | (word().toLong << 16)) & 0xFFFFFFFFL
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) { ensure()
        val take = math.min(left, (segs(si).length - off).toLong)
        off += take.toInt; left -= take
        if (take == 0) return // truncated input: stop rather than spin
      }
    }
    private def segRemaining: Int = { ensure(); segs(si).length - off }
    /** BIFF8 XLUnicodeRichExtendedString (the SST entry form). */
    def xlString(): String = {
      val cch = word()
      var grbit = byte()
      val rich = (grbit & 0x08) != 0
      val ext = (grbit & 0x04) != 0
      val cRun = if (rich) word() else 0
      val cbExt = if (ext) dword() else 0L
      val sb = new java.lang.StringBuilder(cch)
      var read = 0
      while (read < cch) {
        // crossing into a CONTINUE segment mid-characters: a fresh
        // compression flag precedes the remaining chars (BIFF8 rule)
        if ({ ensure(); off == 0 && si > 0 && read > 0 }) grbit = byte()
        var wide = (grbit & 0x01) != 0
        var avail = segRemaining / (if (wide) 2 else 1)
        // malformed BIFF8: a wide run leaving one odd byte before a
        // CONTINUE boundary. Drop the dangling byte and re-read the next
        // segment's compression flag instead of letting word() straddle
        // the boundary unflagged (which would shift every later char).
        while (avail == 0 && si < segs.length - 1) {
          skip(segRemaining.toLong)
          grbit = byte()
          wide = (grbit & 0x01) != 0
          avail = segRemaining / (if (wide) 2 else 1)
        }
        val take = math.min(cch - read, math.max(avail, 1))
        var i = 0
        while (i < take) {
          val c = if (wide) word() else byte()
          sb.append(c.toChar); i += 1
        }
        read += take
      }
      skip(4L * cRun); skip(cbExt)
      sb.toString
    }
  }

  /** Number → all-strings lexical form: whole values print as integers
    * (Excel's own stored form for integer cells), others via the
    * shortest-round-trip Double.toString.
    */
  private def numToString(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def decodeRk(rk: Long): String = {
    val div100 = (rk & 1L) != 0
    val asInt = (rk & 2L) != 0
    val v =
      if (asInt) (rk >> 2).toInt.toDouble // 30-bit signed int
      else java.lang.Double.longBitsToDouble((rk & ~3L) << 32)
    numToString(if (div100) v / 100 else v)
  }

  /** Read every sheet of a BIFF8 workbook as an all-strings DataFrame,
    * keyed by sheet name (mirrors [[Xlsx.readSheets]]).
    */
  def readSheets(spark: SparkSession, path: String): Map[String, DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(path), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    val bytes = try in.readAllBytes() finally in.close()
    val streams = cfbStreams(bytes)
    val wb = streams.getOrElse("Workbook",
      streams.getOrElse("Book", sys.error("no Workbook stream in .xls")))

    // ---- one linear pass over the globals substream ------------------
    var pos = 0
    val sst = mutable.ArrayBuffer[String]()
    val sheets = mutable.Buffer[(String, Int)]() // name -> stream offset
    var inGlobals = true
    while (inGlobals && pos + 4 <= wb.length) {
      val typ = u16(wb, pos); val len = u16(wb, pos + 2)
      val body = pos + 4
      typ match {
        case 0x0085 => // BOUNDSHEET: u32 offset, u16 flags, ShortXLUnicodeString
          val off = u32(wb, body).toInt
          val cch = u8(wb, body + 6)
          val wide = (u8(wb, body + 7) & 1) != 0
          val name =
            if (wide) new String(wb, body + 8, cch * 2, "UTF-16LE")
            else new String(wb, body + 8, cch, "ISO-8859-1")
          sheets += (name -> off)
        case 0x00FC => // SST (+ CONTINUEs): u32 total, u32 unique, strings
          val segs = mutable.ArrayBuffer[Array[Byte]]()
          segs += java.util.Arrays.copyOfRange(wb, body + 8, body + len)
          var p = pos + 4 + len
          while (p + 4 <= wb.length && u16(wb, p) == 0x003C) {
            val clen = u16(wb, p + 2)
            segs += java.util.Arrays.copyOfRange(wb, p + 4, p + 4 + clen)
            p += 4 + clen
          }
          val unique = u32(wb, body + 4)
          val cur = new Segments(segs.toIndexedSeq)
          var i = 0L
          while (i < unique && cur.hasMore) { sst += cur.xlString(); i += 1 }
        case 0x000A => inGlobals = false // EOF of workbook globals
        case _ =>
      }
      pos += 4 + len
    }

    // ---- per-sheet substream → cell map ------------------------------
    def readSheet(start: Int): Seq[Map[Int, String]] = {
      val cells = mutable.Map[(Int, Int), String]()
      var p = start
      var maxRow = -1
      var done = false
      var pendingFormulaCell: Option[(Int, Int)] = None
      while (!done && p + 4 <= wb.length) {
        val typ = u16(wb, p); val len = u16(wb, p + 2)
        val b = p + 4
        def row = u16(wb, b); def col = u16(wb, b + 2)
        typ match {
          case 0x00FD => // LABELSST
            val isst = u32(wb, b + 6).toInt
            if (isst < sst.length) cells((row, col)) = sst(isst)
            maxRow = math.max(maxRow, row)
          case 0x0204 => // LABEL (inline string cell)
            val segs = IndexedSeq(java.util.Arrays.copyOfRange(wb, b + 6, b + len))
            cells((row, col)) = new Segments(segs).xlString()
            maxRow = math.max(maxRow, row)
          case 0x0203 => // NUMBER
            cells((row, col)) = numToString(f64(wb, b + 6))
            maxRow = math.max(maxRow, row)
          case 0x027E => // RK: row, col, ixfe, 4-byte RK value
            cells((row, col)) = decodeRk(u32(wb, b + 6))
            maxRow = math.max(maxRow, row)
          case 0x00BD => // MULRK: row, colFirst, (ixfe+RK)*, colLast
            val colFirst = u16(wb, b + 2)
            val n = (len - 6) / 6
            for (i <- 0 until n) {
              val rk = u32(wb, b + 4 + 6 * i + 2)
              cells((row, colFirst + i)) = decodeRk(rk)
            }
            maxRow = math.max(maxRow, row)
          case 0x0205 => // BOOLERR
            if (u8(wb, b + 7) == 0) // value (not error)
              cells((row, col)) = if (u8(wb, b + 6) != 0) "True" else "False"
            maxRow = math.max(maxRow, row)
          case 0x0006 => // FORMULA: cached result in bytes 6..13
            val r = row; val c = col
            maxRow = math.max(maxRow, r)
            if (u16(wb, b + 12) == 0xFFFF) u8(wb, b + 6) match {
              case 0 => pendingFormulaCell = Some((r, c)) // string follows
              case 1 => cells((r, c)) = if (u8(wb, b + 8) != 0) "True" else "False"
              case _ => // error / empty cached result → null
            }
            else cells((r, c)) = numToString(f64(wb, b + 6))
          case 0x0207 => // STRING (cached formula string result)
            pendingFormulaCell.foreach { rc =>
              val segs = IndexedSeq(java.util.Arrays.copyOfRange(wb, b, b + len))
              cells(rc) = new Segments(segs).xlString()
            }
            pendingFormulaCell = None
          case 0x000A => done = true
          case _ =>
        }
        p += 4 + len
      }
      (0 to maxRow).map { r =>
        cells.collect { case ((`r`, c), v) => c -> v }.toMap
      }
    }

    sheets.map { case (name, off) =>
      val rows = readSheet(off)
      val header = rows.headOption.getOrElse(Map.empty)
      val width = (header.keys ++ rows.flatMap(_.keys)).maxOption.map(_ + 1).getOrElse(0)
      val colNames = (0 until width).map(i => header.getOrElse(i, s"_c$i"))
      val data = rows.drop(1).map { r =>
        org.apache.spark.sql.Row.fromSeq((0 until width).map(i => r.get(i).orNull))
      }
      val schema = StructType(colNames.map(StructField(_, StringType, nullable = true)))
      name -> spark.createDataFrame(
        spark.sparkContext.parallelize(data, math.max(1, data.size / 10000)), schema)
    }.foldLeft(scala.collection.immutable.ListMap.empty[String, DataFrame])(_ + _)
  }

  /** First (or named) sheet only — `read_excel(..., sheet_name = 0)`. */
  def read(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame = {
    val all = readSheets(spark, path)
    sheet.map(all(_)).getOrElse(all.head._2)
  }
}
