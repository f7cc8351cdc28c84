package graft.sources.excel

import java.io.{InputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal xlsx codec built on `java.util.zip` + StAX — no external
  * dependency (offline build; no POI in /opt/spark/jars). xlsx is a zip
  * of XML parts; we emit inline strings (no sharedStrings table) and
  * parse both inline and shared strings on read.
  *
  * This is the byte-level core; Spark integration lives in
  * [[ExcelTable]] / [[ExcelSink]].
  */
object Xlsx {

  // ---------------------------------------------------------------- write

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c >= ' ' || c == '\t' || c == '\n' || c == '\r' => sb.append(c)
      case _ => () // strip control chars xlsx forbids
    }
    sb.toString
  }

  /** Column ordinal (1-based) -> Excel letters. */
  def colLetter(n: Int): String = {
    @annotation.tailrec
    def go(x: Int, acc: String): String =
      if (x <= 0) acc else go((x - 1) / 26, ('A' + (x - 1) % 26).toChar.toString + acc)
    go(n, "")
  }

  /** Excel letters -> 1-based ordinal. */
  def colOrdinal(letters: String): Int =
    letters.foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1))

  /** A cell value with its target 1-based (row, col) and an optional
    * style: 0 = none, 1..n = 1-based index into the `fills` palette
    * passed to [[write]] (ARGB hex strings). */
  final case class Cell(row: Int, col: Int, value: CellValue, style: Int = 0)

  sealed trait CellValue
  final case class SStr(v: String) extends CellValue
  final case class SNum(v: Double) extends CellValue
  final case class SBool(v: Boolean) extends CellValue
  case object SBlank extends CellValue

  /** Date / datetime cells: written as Excel serial numbers with a
    * built-in date number format (numFmtId 14 / 22), the way real
    * spreadsheet writers emit them (reference parity: Download.py:188-191
    * writes typed COM dates, not strings). */
  final case class SDate(serial: Double) extends CellValue
  final case class SDateTime(serial: Double) extends CellValue

  /** Excel's serial epoch in the 1900 date system. Day 1 = 1900-01-01,
    * with the fictitious 1900-02-29 (Lotus bug) folded in by anchoring at
    * 1899-12-30 — correct for all dates >= 1900-03-01, same convention
    * as openpyxl/COM. */
  private val ExcelEpoch = java.time.LocalDate.of(1899, 12, 30)

  def dateSerial(d: java.time.LocalDate): Double =
    java.time.temporal.ChronoUnit.DAYS.between(ExcelEpoch, d).toDouble

  def dateTimeSerial(dt: java.time.LocalDateTime): Double =
    dateSerial(dt.toLocalDate) +
      (dt.toLocalTime.toNanoOfDay / 1e9) / 86400.0

  /** Serial -> canonical string for the all-string scan: date-formatted
    * cells read back as `yyyy-MM-dd`, datetime as `yyyy-MM-dd HH:mm:ss`
    * (seconds-rounded) — mirroring how openpyxl surfaces typed date
    * cells as date objects rather than raw serials. */
  def serialToString(serial: Double, withTime: Boolean): String = {
    val days = math.floor(serial).toLong
    val date = ExcelEpoch.plusDays(days)
    if (!withTime) date.toString
    else {
      val secs = math.round((serial - days) * 86400.0)
      val dt = date.atStartOfDay.plusSeconds(secs)
      dt.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
    }
  }

  /** Rich-text runs: (token, changed) pairs; changed tokens render in
    * bold red (the reference's word-diff presentation,
    * Compare.py:96-110). Tokens are joined by single spaces. */
  final case class SRuns(runs: Seq[(String, Boolean)]) extends CellValue

  /** Write a single-sheet (plus optional extra sheets) workbook.
    * `sheets` maps sheet name -> iterator of sparse cells, which MUST be
    * grouped by row in ascending row order (cells within a row in
    * ascending col order). Streaming: one pass, constant memory.
    */
  def write(out: OutputStream, sheets: Seq[(String, Iterator[Cell])],
            fills: Seq[String] = Nil): Unit = {
    val zip = new ZipOutputStream(out)
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    val n = sheets.size
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString +
        """</Types>""")
    // styles: fill k (1-based in Cell.style) -> cellXf index k; xf 0 =
    // none. Fill ids 0/1 are reserved (none/gray125) per the OOXML spec.
    // Two trailing xfs carry the built-in date (numFmtId 14) and
    // datetime (numFmtId 22) number formats for SDate/SDateTime cells.
    val dateXf = fills.size + 1
    val dateTimeXf = fills.size + 2
    part("xl/styles.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>""" +
        s"""<fills count="${fills.size + 2}">""" +
        """<fill><patternFill patternType="none"/></fill>""" +
        """<fill><patternFill patternType="gray125"/></fill>""" +
        fills.map(argb =>
          s"""<fill><patternFill patternType="solid"><fgColor rgb="$argb"/><bgColor indexed="64"/></patternFill></fill>""")
          .mkString +
        """</fills>""" +
        """<borders count="1"><border/></borders>""" +
        """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
        s"""<cellXfs count="${fills.size + 3}"><xf/>""" +
        fills.indices.map(i =>
          s"""<xf fillId="${i + 2}" applyFill="1"/>""").mkString +
        """<xf numFmtId="14" applyNumberFormat="1"/>""" +
        """<xf numFmtId="22" applyNumberFormat="1"/>""" +
        """</cellXfs></styleSheet>""")
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
    part("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString +
        """</sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
          .mkString +
        """</Relationships>""")

    sheets.zipWithIndex.foreach { case ((_, cells), i) =>
      zip.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${i + 1}.xml"))
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(zip, "UTF-8"))
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      var curRow = -1
      cells.foreach { c =>
        if (c.row != curRow) {
          if (curRow != -1) w.write("</row>")
          w.write(s"""<row r="${c.row}">""")
          curRow = c.row
        }
        val ref = colLetter(c.col) + c.row
        val s = if (c.style > 0) s""" s="${c.style}"""" else ""
        c.value match {
          case SStr(v) =>
            w.write(s"""<c r="$ref"$s t="inlineStr"><is><t xml:space="preserve">${xmlEscape(v)}</t></is></c>""")
          case SNum(v) => w.write(s"""<c r="$ref"$s><v>$v</v></c>""")
          case SDate(serial) =>
            w.write(s"""<c r="$ref" s="$dateXf"><v>${serial.toLong}</v></c>""")
          case SDateTime(serial) =>
            w.write(s"""<c r="$ref" s="$dateTimeXf"><v>$serial</v></c>""")
          case SBool(v) => w.write(s"""<c r="$ref"$s t="b"><v>${if (v) 1 else 0}</v></c>""")
          case SRuns(runs) =>
            w.write(s"""<c r="$ref"$s t="inlineStr"><is>""")
            runs.zipWithIndex.foreach { case ((tok, changed), i) =>
              val text = (if (i > 0) " " else "") + tok
              val pr =
                if (changed) """<rPr><b/><color rgb="FFFF0000"/></rPr>""" else ""
              w.write(s"""<r>$pr<t xml:space="preserve">${xmlEscape(text)}</t></r>""")
            }
            w.write("""</is></c>""")
          case SBlank => w.write(s"""<c r="$ref"$s/>""")
        }
      }
      if (curRow != -1) w.write("</row>")
      w.write("""</sheetData></worksheet>""")
      w.flush()
      zip.closeEntry()
    }
    zip.finish()
  }

  // ----------------------------------------------------------------- read

  /** One parsed sheet: sparse cells as (row, col) -> string value.
    * All-string read (reference Compare.py:41-43 `dtype=str`): numeric
    * cells keep their literal XML text. */
  final case class Sheet(name: String, cells: Map[(Int, Int), String]) {
    val maxRow: Int = if (cells.isEmpty) 0 else cells.keys.map(_._1).max
    val maxCol: Int = if (cells.isEmpty) 0 else cells.keys.map(_._2).max
    def apply(row: Int, col: Int): String = cells.getOrElse((row, col), "")
  }

  private def parseRef(ref: String): (Int, Int) = {
    val letters = ref.takeWhile(_.isLetter)
    val digits = ref.drop(letters.length)
    (digits.toInt, colOrdinal(letters))
  }

  /** Parse every worksheet (and sharedStrings/styles, if present). */
  def read(in: InputStream): Seq[Sheet] = {
    val zin = new ZipInputStream(in)
    val parts = mutable.Map[String, Array[Byte]]()
    var e = zin.getNextEntry
    while (e != null) {
      if (e.getName == "xl/sharedStrings.xml" ||
        e.getName == "xl/workbook.xml" ||
        e.getName == "xl/styles.xml" ||
        e.getName.matches("xl/worksheets/sheet\\d+\\.xml"))
        parts(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val names: Seq[String] = parts.get("xl/workbook.xml")
      .map(parseSheetNames).getOrElse(Seq.empty)
    val numFmts: IndexedSeq[Int] = parts.get("xl/styles.xml")
      .map(parseCellXfNumFmts).getOrElse(IndexedSeq.empty)
    val sheetParts = parts.keys.filter(_.startsWith("xl/worksheets/"))
      .toSeq.sortBy(p => p.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml").toInt)
    sheetParts.zipWithIndex.map { case (p, i) =>
      Sheet(names.lift(i).getOrElse(s"Sheet${i + 1}"),
        parseSheet(parts(p), shared, numFmts))
    }
  }

  private val xif: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = false; out += cur.toString
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  private def parseSheetNames(bytes: Array[Byte]): Seq[String] = {
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer[String]()
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet")
        out += Option(r.getAttributeValue(null, "name")).getOrElse("")
    }
    out.toSeq
  }

  /** cellXfs -> numFmtId per xf index (for date-cell detection). */
  private def parseCellXfNumFmts(bytes: Array[Byte]): IndexedSeq[Int] = {
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer[Int]()
    var inCellXfs = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              out += Option(r.getAttributeValue(null, "numFmtId"))
                .map(_.toInt).getOrElse(0)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  // built-in date/datetime number formats (ECMA-376 §18.8.30): 14-17
  // date-only, 18-21 time, 22 datetime, 45-47 elapsed time
  private def isDateFmt(id: Int) = id >= 14 && id <= 17
  private def isDateTimeFmt(id: Int) = (id >= 18 && id <= 22) ||
    (id >= 45 && id <= 47)

  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String],
                         numFmts: IndexedSeq[Int]): Map[(Int, Int), String] = {
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val cells = mutable.Map[(Int, Int), String]()
    var ref: String = null
    var cellType: String = null
    var styleIdx: Int = -1
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "c" =>
              ref = r.getAttributeValue(null, "r")
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              styleIdx = Option(r.getAttributeValue(null, "s"))
                .map(_.toInt).getOrElse(-1)
              text.clear()
            case "v" => inV = true
            case "t" => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" if ref != null =>
              val raw = text.toString
              val fmt = if (styleIdx >= 0) numFmts.lift(styleIdx).getOrElse(0)
                        else 0
              val value = cellType match {
                case "s" => shared.lift(raw.trim.toInt).getOrElse("")
                case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
                // date-formatted numeric cells surface as dates, the way
                // openpyxl hands them to the reference (Compare.py reads
                // date objects, not serials)
                case "n" if raw.nonEmpty && isDateFmt(fmt) =>
                  serialToString(raw.trim.toDouble, withTime = false)
                case "n" if raw.nonEmpty && isDateTimeFmt(fmt) =>
                  serialToString(raw.trim.toDouble, withTime = true)
                case _ => raw
              }
              if (value.nonEmpty) cells(parseRef(ref)) = value
              ref = null
            case _ =>
          }
        case _ =>
      }
    }
    cells.toMap
  }
}
