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

  /** First date for which the 1899-12-30 anchor is exact (serials for
    * 1900-01-01..1900-02-28 are off by one under this convention). */
  private val MinExactDate = java.time.LocalDate.of(1900, 3, 1)

  /** Whether the 1900 serial system represents `d` exactly — callers
    * that stream cells should check this and degrade to a string cell
    * instead of letting [[dateSerial]] throw mid-write. */
  def isSerialRepresentable(d: java.time.LocalDate): Boolean =
    !d.isBefore(MinExactDate)

  def dateSerial(d: java.time.LocalDate): Double = {
    // refuse rather than silently corrupt: the documented validity
    // window of the Lotus-compatible epoch starts at 1900-03-01
    require(!d.isBefore(MinExactDate),
      s"date $d predates 1900-03-01; the 1900 serial date system cannot " +
        "represent it exactly (Lotus leap-year bug) — write it as a string")
    java.time.temporal.ChronoUnit.DAYS.between(ExcelEpoch, d).toDouble
  }

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
    // After the fill xfs come the built-in date (numFmtId 14) and
    // datetime (numFmtId 22) xfs for unstyled SDate/SDateTime cells,
    // then one (date, datetime) xf pair PER FILL so a date cell that
    // also carries a highlight keeps both its number format and its
    // fill (a date xf that ignored Cell.style would silently drop
    // diff highlights on changed date cells).
    val dateXf = fills.size + 1
    val dateTimeXf = fills.size + 2
    def dateFillXf(style: Int) = fills.size + 2 + (style - 1) * 2 + 1
    def dateTimeFillXf(style: Int) = fills.size + 2 + (style - 1) * 2 + 2
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
        s"""<cellXfs count="${fills.size * 3 + 3}"><xf/>""" +
        fills.indices.map(i =>
          s"""<xf fillId="${i + 2}" applyFill="1"/>""").mkString +
        """<xf numFmtId="14" applyNumberFormat="1"/>""" +
        """<xf numFmtId="22" applyNumberFormat="1"/>""" +
        fills.indices.map(i =>
          s"""<xf numFmtId="14" applyNumberFormat="1" fillId="${i + 2}" applyFill="1"/>""" +
            s"""<xf numFmtId="22" applyNumberFormat="1" fillId="${i + 2}" applyFill="1"/>""").mkString +
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
            val xf = if (c.style > 0) dateFillXf(c.style) else dateXf
            w.write(s"""<c r="$ref" s="$xf"><v>${serial.toLong}</v></c>""")
          case SDateTime(serial) =>
            val xf = if (c.style > 0) dateTimeFillXf(c.style) else dateTimeXf
            w.write(s"""<c r="$ref" s="$xf"><v>$serial</v></c>""")
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

  // --------------------------------------------------- highlight-in-place

  /** Copy a source workbook package verbatim, adding highlight `fills`
    * (ARGB) to its styles and applying per-cell edits to ONE sheet:
    * each cell in `marks` gets a cellXf CLONING its original xf with
    * the fill applied on top (fonts, borders, number formats, alignment
    * all survive), and cells in `runsAt` are additionally replaced by
    * bold-red rich-text runs. Every other byte of the package — shared
    * strings, merged cells, column widths, other sheets, themes —
    * passes through untouched. This is the reference's mutate-and-save
    * semantic (Compare.py:123-126 opens Q2 with styles and saves a copy
    * where only the diff fills are added).
    *
    * `marks` values are 1-based indices into `fills`. Marks on cells
    * with no element in the sheet XML are inserted at the end of their
    * row (ECMA-376 imposes no intra-row order; readers are tolerant).
    * A cell replaced by rich text loses a formula if it had one — same
    * as the reference, which overwrites the cell value with diffed
    * text. */
  def highlightCopy(srcPath: String, out: OutputStream,
                    sheetName: Option[String], fills: Seq[String],
                    marks: Map[(Int, Int), Int],
                    runsAt: Map[(Int, Int), Seq[(String, Boolean)]] = Map.empty): Unit = {
    val zin = new ZipInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(srcPath)))
    val parts = mutable.LinkedHashMap[String, Array[Byte]]()
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) parts(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()

    // resolve the sheet PART via workbook.xml r:id -> workbook.xml.rels
    // Target — NOT positionally: Excel keeps part filenames stable when
    // sheets are reordered/deleted, so workbook.xml order need not match
    // sheetN.xml numbering on externally-produced workbooks (ADVICE r5).
    val sheetPart = resolveSheetPart(parts, sheetName)
      .getOrElse {
        // fallback for rels-free packages (our own writer always emits
        // rels, so this only fires on hand-rolled minimal inputs)
        val names = parts.get("xl/workbook.xml").map(parseSheetNames)
          .getOrElse(Seq.empty)
        val idx = sheetName.map(n => names.indexOf(n)).filter(_ >= 0).getOrElse(0)
        s"xl/worksheets/sheet${idx + 1}.xml"
      }
    require(parts.contains(sheetPart), s"missing $sheetPart in $srcPath")
    require(parts.contains("xl/styles.xml"),
      s"$srcPath has no xl/styles.xml; highlightCopy patches existing styles")

    val cellStyles = parseCellStyleIdx(parts(sheetPart))
    val styleOf: ((Int, Int)) => Int = rc => cellStyles.getOrElse(rc, 0)
    val combos: Seq[(Int, Int)] = marks.toSeq
      .map { case (rc, f) => (styleOf(rc), f) }.distinct.sorted
    val (patchedStyles, comboXf) = patchStyles(
      new String(parts("xl/styles.xml"), "UTF-8"), fills, combos)
    val patchedSheet = patchSheet(new String(parts(sheetPart), "UTF-8"),
      rc => comboXf((styleOf(rc), marks(rc))), marks, runsAt)

    val zout = new ZipOutputStream(out)
    parts.foreach { case (name, bytes) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(name match {
        case "xl/styles.xml" => patchedStyles.getBytes("UTF-8")
        case `sheetPart` => patchedSheet.getBytes("UTF-8")
        case _ => bytes
      })
      zout.closeEntry()
    }
    zout.finish()
  }

  /** Per-cell style index (`s` attribute) of a sheet part; cells
    * without one are xf 0 and omitted. */
  private def parseCellStyleIdx(bytes: Array[Byte]): Map[(Int, Int), Int] = {
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = mutable.Map[(Int, Int), Int]()
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "c") {
        val ref = r.getAttributeValue(null, "r")
        val s = Option(r.getAttributeValue(null, "s")).map(_.toInt).getOrElse(0)
        if (ref != null && s > 0) out(parseRef(ref)) = s
      }
    }
    out.toMap
  }

  /** Append `fills` and one cellXf per (original xf, fill) combo to an
    * existing styles.xml; the combo xf is the original xf element with
    * fillId overridden, so every other facet of the original style is
    * retained. Returns the patched XML and combo -> new xf index. */
  private def patchStyles(xml: String, fills: Seq[String],
                          combos: Seq[(Int, Int)]): (String, Map[(Int, Int), Int]) = {
    require(xml.contains("</fills>") && xml.contains("</cellXfs>"),
      "styles.xml lacks fills/cellXfs sections")
    val fillCountRe = """<fills count="(\d+)"""".r
    val oldFillCount = fillCountRe.findFirstMatchIn(xml)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException("fills has no count attr"))
    var x = xml.replaceFirst(s"""<fills count="$oldFillCount"""",
      s"""<fills count="${oldFillCount + fills.size}"""")
    val fillXml = fills.map(argb =>
      s"""<fill><patternFill patternType="solid"><fgColor rgb="$argb"/><bgColor indexed="64"/></patternFill></fill>""")
      .mkString
    x = x.replace("</fills>", fillXml + "</fills>")

    val start = x.indexOf("<cellXfs")
    val tagEnd = x.indexOf('>', start)
    val end = x.indexOf("</cellXfs>")
    require(start >= 0 && end > tagEnd)
    val inner = x.substring(tagEnd + 1, end)
    val xfRe = """(?s)<xf\b[^>]*?(?:/>|>.*?</xf>)""".r
    val xfs = xfRe.findAllIn(inner).toVector
    val newXfs = combos.map { case (orig, fill) =>
      val base = if (orig >= 0 && orig < xfs.size) xfs(orig) else "<xf/>"
      withFillId(base, oldFillCount + fill - 1)
    }
    val comboMap = combos.zipWithIndex
      .map { case (c, i) => c -> (xfs.size + i) }.toMap
    val oldTag = x.substring(start, tagEnd + 1)
    val newTag =
      if (oldTag.contains("count=\""))
        oldTag.replaceAll("""count="\d+"""", s"""count="${xfs.size + combos.size}"""")
      else oldTag
    x = x.substring(0, start) + newTag + inner + newXfs.mkString +
      "</cellXfs>" + x.substring(end + "</cellXfs>".length)
    (x, comboMap)
  }

  /** Clone an `<xf .../>` element with its fillId replaced. */
  private def withFillId(xf: String, fillId: Int): String = {
    val tagEnd = xf.indexOf('>')
    var tag = xf.substring(0, tagEnd)
    val selfClosing = tag.endsWith("/")
    if (selfClosing) tag = tag.dropRight(1)
    tag = tag.replaceAll("""\s+fillId="\d+"""", "")
      .replaceAll("""\s+applyFill="[^"]*"""", "") +
      s""" fillId="$fillId" applyFill="1""""
    tag + (if (selfClosing) "/>" else ">") + xf.substring(tagEnd + 1)
  }

  /** Rewrite a sheet XML: marked cells get their new xf (and rich-text
    * replacement where present); marks without a cell element are
    * appended inside (or as) their row. */
  private def patchSheet(xml: String, newXfFor: ((Int, Int)) => Int,
                         marks: Map[(Int, Int), Int],
                         runsAt: Map[(Int, Int), Seq[(String, Boolean)]]): String = {
    def quoted(s: String) = java.util.regex.Matcher.quoteReplacement(s)
    val seen = mutable.Set[(Int, Int)]()
    val cellRe = """(?s)<c\b[^>]*?(?:/>|>.*?</c>)""".r
    val refRe = """\br="([A-Z]+\d+)"""".r
    var x = cellRe.replaceAllIn(xml, m => {
      val elem = m.matched
      refRe.findFirstMatchIn(elem).map(_.group(1)) match {
        case Some(ref) =>
          val rc = parseRef(ref)
          if (!marks.contains(rc)) quoted(elem)
          else {
            seen += rc
            val s = newXfFor(rc)
            quoted(runsAt.get(rc) match {
              case Some(runs) => richTextCell(ref, s, runs)
              case None => setStyleAttr(elem, s)
            })
          }
        case None => quoted(elem)
      }
    })
    val missingByRow: Map[Int, Seq[(Int, Int)]] =
      (marks.keySet -- seen).toSeq.sorted.groupBy(_._1)
    if (missingByRow.nonEmpty) {
      def newCells(r: Int): String = missingByRow(r).map { rc =>
        runsAt.get(rc) match {
          case Some(runs) =>
            richTextCell(colLetter(rc._2) + rc._1, newXfFor(rc), runs)
          case None =>
            s"""<c r="${colLetter(rc._2)}${rc._1}" s="${newXfFor(rc)}"/>"""
        }
      }.mkString
      val doneRows = mutable.Set[Int]()
      val rowRe = """(?s)<row\b[^>]*?(?:/>|>.*?</row>)""".r
      val rowNumRe = """\br="(\d+)"""".r
      x = rowRe.replaceAllIn(x, m => {
        val elem = m.matched
        rowNumRe.findFirstMatchIn(elem).map(_.group(1).toInt) match {
          case Some(r) if missingByRow.contains(r) =>
            doneRows += r
            quoted(
              if (elem.endsWith("/>")) elem.dropRight(2) + ">" + newCells(r) + "</row>"
              else elem.stripSuffix("</row>") + newCells(r) + "</row>")
          case _ => quoted(elem)
        }
      })
      val leftover = missingByRow.keys.filterNot(doneRows).toSeq.sorted
      if (leftover.nonEmpty) {
        val rowsXml = leftover
          .map(r => s"""<row r="$r">${newCells(r)}</row>""").mkString
        x = if (x.contains("</sheetData>"))
          x.replace("</sheetData>", rowsXml + "</sheetData>")
        else x.replace("<sheetData/>", s"<sheetData>$rowsXml</sheetData>")
      }
    }
    x
  }

  private def setStyleAttr(cellElem: String, xf: Int): String = {
    val tagEnd = cellElem.indexOf('>')
    var tag = cellElem.substring(0, tagEnd)
    val selfClosing = tag.endsWith("/")
    if (selfClosing) tag = tag.dropRight(1)
    tag = tag.replaceAll("""\s+s="\d+"""", "") + s""" s="$xf""""
    tag + (if (selfClosing) "/>" else ">") + cellElem.substring(tagEnd + 1)
  }

  private def richTextCell(ref: String, xf: Int,
                           runs: Seq[(String, Boolean)]): String = {
    val sb = new StringBuilder
    sb.append(s"""<c r="$ref" s="$xf" t="inlineStr"><is>""")
    runs.zipWithIndex.foreach { case ((tok, changed), i) =>
      val text = (if (i > 0) " " else "") + tok
      val pr = if (changed) """<rPr><b/><color rgb="FFFF0000"/></rPr>""" else ""
      sb.append(s"""<r>$pr<t xml:space="preserve">${xmlEscape(text)}</t></r>""")
    }
    sb.append("</is></c>")
    sb.toString
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
      // collect ANY sheet part (worksheets AND chartsheets, any part
      // name) so rels Targets with nonstandard filenames still resolve
      if (e.getName == "xl/sharedStrings.xml" ||
        e.getName == "xl/workbook.xml" ||
        e.getName == "xl/styles.xml" ||
        e.getName == "xl/_rels/workbook.xml.rels" ||
        e.getName.matches("xl/(work|chart)sheets/[^/]+\\.xml"))
        parts(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val numFmts: IndexedSeq[Int] = parts.get("xl/styles.xml")
      .map(parseCellXfNumFmts).getOrElse(IndexedSeq.empty)
    // positional candidates: numbered worksheet parts in numeric order,
    // then any other worksheet parts in name order
    def partNum(p: String): Option[Int] =
      p.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml").toIntOption
    val positional: Seq[String] = parts.keys
      .filter(_.startsWith("xl/worksheets/")).toSeq
      .sortBy(p => (partNum(p).isEmpty, partNum(p).getOrElse(0), p))
    // name -> part association via r:id + rels (workbook order, same
    // resolution as highlightCopy). When a declared sheet's rel is
    // missing or its Target wasn't collected, fall back to the
    // positional part at that sheet's workbook index rather than
    // silently dropping the sheet (a partially-resolvable rels part
    // must not shrink the result below what positional numbering gives)
    val declared: Seq[(String, String)] = parts.get("xl/workbook.xml")
      .map(parseSheetEntries).getOrElse(Seq.empty)
    val rels: Map[String, String] = parts.get("xl/_rels/workbook.xml.rels")
      .map(parseWorkbookRels).getOrElse(Map.empty)
    if (declared.nonEmpty)
      declared.zipWithIndex.flatMap { case ((name, rid), i) =>
        rels.get(rid).filter(parts.contains).orElse(positional.lift(i))
          .map(p => Sheet(name, parseSheet(parts(p), shared, numFmts)))
      }
    else
      positional.zipWithIndex.map { case (p, i) =>
        Sheet(s"Sheet${i + 1}", parseSheet(parts(p), shared, numFmts))
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

  private def parseSheetNames(bytes: Array[Byte]): Seq[String] =
    parseSheetEntries(bytes).map(_._1)

  /** workbook.xml sheet entries in workbook order: (name, r:id). */
  private def parseSheetEntries(bytes: Array[Byte]): Seq[(String, String)] = {
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer[(String, String)]()
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        val name = Option(r.getAttributeValue(null, "name")).getOrElse("")
        // r:id lives in the relationships namespace; match by local name
        // so prefix choice doesn't matter
        val rid = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id" &&
            Option(r.getAttributeNamespace(i)).exists(_.contains("relationships")))
          .map(r.getAttributeValue)
          .getOrElse("")
        out += name -> rid
      }
    }
    out.toSeq
  }

  /** workbook.xml.rels: relationship Id -> resolved part name (Target
    * is workbook-relative, e.g. `worksheets/sheet3.xml`, or
    * package-absolute with a leading `/`). */
  private def parseWorkbookRels(bytes: Array[Byte]): Map[String, String] = {
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = mutable.Map[String, String]()
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
        r.getLocalName == "Relationship") {
        val id = Option(r.getAttributeValue(null, "Id")).getOrElse("")
        val target = Option(r.getAttributeValue(null, "Target")).getOrElse("")
        val part =
          if (target.startsWith("/")) target.stripPrefix("/")
          else "xl/" + target
        if (id.nonEmpty && target.nonEmpty) out(id) = part
      }
    }
    out.toMap
  }

  /** The sheet part for `sheetName` (first sheet when None), resolved
    * through the OOXML relationship chain; None when the package lacks
    * workbook.xml or usable rels. */
  private def resolveSheetPart(parts: collection.Map[String, Array[Byte]],
                               sheetName: Option[String]): Option[String] =
    for {
      wb <- parts.get("xl/workbook.xml")
      rels <- parts.get("xl/_rels/workbook.xml.rels").map(parseWorkbookRels)
      entries = parseSheetEntries(wb)
      entry <- sheetName.fold(entries.headOption)(n => entries.find(_._1 == n))
      part <- rels.get(entry._2)
    } yield part

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
