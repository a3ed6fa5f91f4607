package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S3 — Excel ingestion with all-strings semantics (reference
  * lib/id3c/cli/io/pandas.py:91-133 `read_excel`: every cell read as or
  * cast to a string so manifests with mixed-typed barcode columns load
  * losslessly).
  *
  * xlsx is a ZIP of XML parts; this reader uses only the JDK (zip +
  * DOM) — no external dependency. Parsing happens on the driver: like
  * the reference's pandas path, spreadsheet manifests are dimension-scale
  * inputs (thousands of rows), not fact tables; the resulting DataFrame
  * is then distributed for the join-heavy QC that follows.
  *
  * Supported cell forms: shared strings (t="s"), inline strings
  * (t="inlineStr"), and raw values (numbers/booleans kept verbatim as
  * their stored lexical form — the all-strings contract). First row is
  * the header (pandas header=0). Missing cells are null.
  */
object Xlsx {

  private def dom(bytes: Array[Byte]) = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def children(n: org.w3c.dom.Node, name: String): Seq[org.w3c.dom.Element] = {
    val out = mutable.Buffer[org.w3c.dom.Element]()
    val kids = n.getChildNodes
    var i = 0
    while (i < kids.getLength) {
      kids.item(i) match {
        case e: org.w3c.dom.Element if e.getTagName == name => out += e
        case _ =>
      }
      i += 1
    }
    out.toSeq
  }

  /** "B7" → 0-based column index (A=0, AA=26, …). */
  def columnIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  /** Read every sheet of an xlsx as an all-strings DataFrame, keyed by
    * sheet name (mirrors `read_excel(..., sheet_name = None)`).
    */
  def readSheets(spark: SparkSession, path: String): Map[String, DataFrame] = {
    // ---- unzip the parts we need -------------------------------------
    val parts = mutable.Map[String, Array[Byte]]()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(path), spark.sparkContext.hadoopConfiguration)
    val in = new ZipInputStream(fs.open(new org.apache.hadoop.fs.Path(path)))
    try {
      var entry = in.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) parts(entry.getName) = in.readAllBytes()
        entry = in.getNextEntry
      }
    } finally in.close()

    // ---- shared strings ----------------------------------------------
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml") match {
      case Some(bytes) =>
        children(dom(bytes).getDocumentElement, "si")
          .map(si => si.getTextContent).toIndexedSeq
      case None => IndexedSeq.empty
    }

    // ---- sheet name → part path via workbook rels --------------------
    val rels: Map[String, String] = parts.get("xl/_rels/workbook.xml.rels")
      .map { bytes =>
        children(dom(bytes).getDocumentElement, "Relationship")
          .map(r => r.getAttribute("Id") ->
            ("xl/" + r.getAttribute("Target").stripPrefix("/xl/").stripPrefix("xl/")))
          .toMap
      }.getOrElse(Map.empty)
    val workbook = dom(parts("xl/workbook.xml")).getDocumentElement
    val sheets: Seq[(String, String)] = children(workbook, "sheets").flatMap {
      ss => children(ss, "sheet").map { s =>
        val rid = s.getAttribute("r:id") match {
          case "" => s.getAttribute("id")
          case v => v
        }
        s.getAttribute("name") -> rels.getOrElse(rid, "xl/worksheets/sheet1.xml")
      }
    }

    // ---- per-sheet cell grid → header + rows -------------------------
    sheets.map { case (name, part) =>
      val sheetRoot = dom(parts(part)).getDocumentElement
      val rows: Seq[Map[Int, String]] =
        children(sheetRoot, "sheetData").flatMap(sd => children(sd, "row")).map { row =>
          children(row, "c").flatMap { c =>
            val idx = columnIndex(c.getAttribute("r"))
            val t = c.getAttribute("t")
            val value: Option[String] = t match {
              case "s" => children(c, "v").headOption
                .map(v => shared(v.getTextContent.trim.toInt))
              case "inlineStr" => children(c, "is").headOption.map(_.getTextContent)
              case _ => children(c, "v").headOption.map(_.getTextContent)
            }
            value.map(idx -> _)
          }.toMap
        }
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
