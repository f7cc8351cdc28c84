package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.pipelines.Pipelines
import graft.sources.excel.{ExcelSink, ExcelScan, ExcelOptions, Xlsx}

class ExcelSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir: String =
    Files.createTempDirectory("excel_spec").toString

  import XlsxTestUtil.{cellXf, fillOf, zipPart}

  test("xlsx write -> read round-trips strings, numbers, blanks") {
    val dir = tmpDir
    val df = Seq(("a", 1.5, "x"), ("b", 2.0, null), ("c & <d>", 3.25, "z"))
      .toDF("name", "num", "opt")
    val path = s"$dir/rt.xlsx"
    val n = ExcelSink.writePositional(df, path, startRow = 1)
    assert(n == 3)
    val back = spark.read.format("xlsx")
      .option("headerRow", "1").option("header", "false")
      .option("dataStartRow", "1").load(path)
    val rows = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length == 3)
    assert(rows(0) == (("a", "1.5", "x")))
    assert(rows(1)._3 == null)              // null -> '' -> blank -> null
    assert(rows(2)._1 == "c & <d>")         // XML escaping round-trip
  }

  test("positional write skips configured sheet columns (SNK2)") {
    val dir = tmpDir
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
    val path = s"$dir/skip.xlsx"
    ExcelSink.writePositional(df, path, startRow = 8, startCol = 1,
      skipSheetCols = Set(2, 4))
    val sheet = ExcelScan.loadSheet(path, None)
    assert(sheet(8, 1) == "1.0")
    assert(sheet(8, 2) == "")   // skipped
    assert(sheet(8, 3) == "2.0")
    assert(sheet(8, 4) == "")   // skipped
    assert(sheet(8, 5) == "3.0")
  }

  test("xlsx DSv2 scan prunes columns to the required schema") {
    val dir = tmpDir
    val df = Seq(("a", "b", "c")).toDF("x", "y", "z")
    val path = s"$dir/prune.xlsx"
    ExcelSink.writePositional(df, path, startRow = 2)
    val hdr = df.columns.zipWithIndex.map { case (c, i) =>
      Xlsx.Cell(1, i + 1, Xlsx.SStr(c)) }
    val sheet = ExcelScan.loadSheet(path, None)
    val data = for {
      r <- (2 to sheet.maxRow).iterator; c <- 1 to sheet.maxCol
      if sheet(r, c).nonEmpty
    } yield Xlsx.Cell(r, c, Xlsx.SStr(sheet(r, c)))
    val out = new java.io.FileOutputStream(path)
    try Xlsx.write(out, Seq("Sheet1" -> (hdr.iterator ++ data)))
    finally out.close()

    val narrow = spark.read.format("xlsx").load(path).select("y")
    val scan = narrow.queryExecution.executedPlan.collectLeaves().head.toString
    // DSv2 BatchScan prints its (pruned) output attribute list
    assert(scan.contains("[y#") && !scan.contains("x#") && !scan.contains("z#"),
      scan.take(400))
    assert(narrow.collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("metadata cell stamp lands on its own sheet at K4 (SNK4)") {
    val dir = tmpDir
    val path = s"$dir/meta.xlsx"
    ExcelSink.writePositional(Seq((1)).toDF("a"), path,
      metadata = Seq(("Data Validation", (4, 11), "08/12/2026")))
    val sheets = {
      val in = new java.io.FileInputStream(path)
      try Xlsx.read(in) finally in.close()
    }
    val dv = sheets.find(_.name == "Data Validation").get
    assert(dv(4, 11) == "08/12/2026")
  }

  test("header probe: blank-run termination and 500-col cap (SRC3)") {
    val dir = tmpDir
    val path = s"$dir/probe.xlsx"
    // headers with an interior blank, then >10 blanks, then a ghost col
    val cells = (Seq("h1", "h2", "", "h4").zipWithIndex.map { case (h, i) =>
      Xlsx.Cell(1, i + 1, Xlsx.SStr(h))
    } :+ Xlsx.Cell(1, 30, Xlsx.SStr("ghost"))).iterator
    val out = new java.io.FileOutputStream(path)
    try Xlsx.write(out, Seq("S" -> cells)) finally out.close()
    val sheet = ExcelScan.loadSheet(path, None)
    val opts = ExcelOptions(None, headerRow = 1, dataStartRow = 2,
      useHeader = true, blankRunStop = 10, maxCols = 500)
    val headers = ExcelScan.probeHeaders(sheet, opts)
    assert(headers == Seq("h1", "h2", "_c3", "h4"))  // ghost beyond run: dropped
  }

  test("download pipeline: clone-name, row 8 start, K4 stamp (e2e)") {
    val dir = tmpDir
    val (path, n) = Pipelines.download(spark, sfDir, "BUILDING",
      LocalDate.of(2026, 8, 12), dir)
    assert(path.endsWith("BUILDING_08_12_2026.xlsx"))
    assert(n > 0)
    val sheets = { val in = new java.io.FileInputStream(path)
      try Xlsx.read(in) finally in.close() }
    val data = sheets.head
    assert(data(7, 1) == "")                  // nothing above startRow 8
    assert(data(8, 1).nonEmpty)
    assert(data(8, 3) == "" && data(8, 5) == "") // skip columns honored
    val dv = sheets.find(_.name == "Data Validation").get
    assert(dv(4, 11) == "08/12/2026")
    // date column formatted %m-%d-%Y somewhere in row 8
    val row8 = (1 to data.maxCol).map(c => data(8, c))
    assert(row8.exists(_.matches("\\d{2}-\\d{2}-\\d{4}")))
    assert(row8.exists(_.matches("-?\\d+%")))  // percent column
  }

  test("upload pipeline: header-matched write honors template positions") {
    val dir = tmpDir
    // build a template: headers at row 5, cols 2/4/6; fuzzy-case names
    val template = s"$dir/template.xlsx"
    val cells = Seq(
      Xlsx.Cell(5, 2, Xlsx.SStr("C  Name")),      // matches c_name
      Xlsx.Cell(5, 4, Xlsx.SStr("C_MKTSEGMENT")), // matches c_mktsegment
      Xlsx.Cell(5, 6, Xlsx.SStr("No Such Col"))).iterator
    val out = new java.io.FileOutputStream(template)
    try Xlsx.write(out, Seq("Sheet1" -> cells)) finally out.close()

    val (path, n) = Pipelines.upload(spark, sfDir, "ALL", template, dir,
      LocalDate.of(2026, 8, 12))
    assert(path.endsWith("ALL_08_12_2026.xlsx"))
    val sheet = ExcelScan.loadSheet(path, None)
    assert(n > 0)
    assert(sheet(6, 2).nonEmpty)        // c_name under template col 2
    assert(sheet(6, 4).nonEmpty)        // segment under template col 4
    assert(sheet(6, 1) == "" && sheet(6, 3) == "" && sheet(6, 6) == "")
    // O1: ALL-mode block order follows SegmentOrder, not data order
    val segCol = (0 until n.toInt).map(i => sheet(6 + i, 4)).filter(_.nonEmpty)
    val order = segCol.distinct
    assert(order == Pipelines.SegmentOrder.filter(order.contains))
  }

  test("highlighted workbook gets fills for CHANGED/NEW cells (SNK5)") {
    val dir = tmpDir
    val q1 = Seq(("k1", "alpha old"), ("k2", "same")).toDF("id", "val")
    val q2 = Seq(("k1", "alpha new"), ("k2", "same"), ("k3", "added"))
      .toDF("id", "val")
    def writeWb(df: org.apache.spark.sql.DataFrame, p: String): Unit = {
      val hdr = df.columns.zipWithIndex.map { case (c, i) =>
        Xlsx.Cell(1, i + 1, Xlsx.SStr(c)) }
      val rows = df.collect().zipWithIndex.flatMap { case (r, ri) =>
        (0 until r.length).map(ci =>
          Xlsx.Cell(ri + 2, ci + 1, Xlsx.SStr(r.getString(ci)))) }
      val out = new java.io.FileOutputStream(p)
      try Xlsx.write(out, Seq("Sheet1" -> (hdr ++ rows).iterator))
      finally out.close()
    }
    writeWb(q1, s"$dir/h_q1.xlsx"); writeWb(q2, s"$dir/h_q2.xlsx")
    val (diff, outPath) = Pipelines.compareAndHighlight(spark,
      s"$dir/h_q1.xlsx", s"$dir/h_q2.xlsx", "id", Seq("val"),
      wordDiffCols = Set("val"))
    assert(outPath.endsWith("h_q2 (change highlighted).xlsx"))
    assert(diff.filter($"status" === "CHANGED").count() == 1)
    // raw XML: the changed cell (B2) and the NEW row (4) carry style refs,
    // and styles.xml defines the solid fills
    val zf = new java.util.zip.ZipFile(outPath)
    def entry(n: String): String = {
      val in = zf.getInputStream(zf.getEntry(n))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val sheetXml = entry("xl/worksheets/sheet1.xml")
    val stylesXml = entry("xl/styles.xml")
    zf.close()
    // resolve each cell's style ref through cellXfs -> fills to the ARGB
    // (in-place highlighting appends combo xfs after the source's own,
    // so absolute indices are layout-dependent)
    assert(fillOf(stylesXml, cellXf(sheetXml, "B2")) == Some("FFADD8E6")) // CHANGED
    assert(fillOf(stylesXml, cellXf(sheetXml, "A4")) == Some("FFFFFF00")) // NEW row
    assert(fillOf(stylesXml, cellXf(sheetXml, "B4")) == Some("FFFFFF00"))
    assert(cellXf(sheetXml, "B3").isEmpty)             // UNCHANGED unstyled
    // rich-text word runs: unchanged token plain, changed token bold red
    assert(sheetXml.contains(
      """<r><t xml:space="preserve">alpha</t></r>""" +
        """<r><rPr><b/><color rgb="FFFF0000"/></rPr>""" +
        """<t xml:space="preserve"> new</t></r>"""), sheetXml.take(2000))
  }

  test("highlightCopy preserves pre-existing styling, layers fills on top") {
    val dir = tmpDir
    val src = s"$dir/styled.xlsx"
    // source workbook with its own styling: a green-filled cell (A2) and
    // a typed date cell (B2, numFmtId 14)
    val cells = Seq(
      Xlsx.Cell(1, 1, Xlsx.SStr("id")), Xlsx.Cell(1, 2, Xlsx.SStr("when")),
      Xlsx.Cell(2, 1, Xlsx.SStr("k1"), style = 1),
      Xlsx.Cell(2, 2, Xlsx.SDate(Xlsx.dateSerial(LocalDate.of(2026, 3, 5)))),
      Xlsx.Cell(3, 1, Xlsx.SStr("k2")), Xlsx.Cell(3, 2, Xlsx.SStr("plain")))
    val o0 = new java.io.FileOutputStream(src)
    try Xlsx.write(o0, Seq("Sheet1" -> cells.iterator), fills = Seq("FF00FF00"))
    finally o0.close()
    val srcSheetXml = zipPart(src, "xl/worksheets/sheet1.xml")
    val srcA2 = cellXf(srcSheetXml, "A2")

    // highlight the DATE cell as CHANGED (blue)
    val outP = s"$dir/styled_hl.xlsx"
    val o1 = new java.io.FileOutputStream(outP)
    try Xlsx.highlightCopy(src, o1, None, Seq("FFADD8E6"), Map((2, 2) -> 1))
    finally o1.close()

    val sheetXml = zipPart(outP, "xl/worksheets/sheet1.xml")
    val stylesXml = zipPart(outP, "xl/styles.xml")
    // the pre-styled unmarked cell keeps its exact original style index
    // and its green fill still resolves
    assert(cellXf(sheetXml, "A2") == srcA2)
    assert(fillOf(stylesXml, cellXf(sheetXml, "A2")) == Some("FF00FF00"))
    // the marked date cell gets the blue fill AND keeps its date format:
    // the combo xf clones the original (numFmtId 14) with fillId replaced
    assert(fillOf(stylesXml, cellXf(sheetXml, "B2")) == Some("FFADD8E6"))
    val cx = stylesXml.substring(stylesXml.indexOf("<cellXfs"),
      stylesXml.indexOf("</cellXfs>"))
    val xfs = """(?s)<xf\b[^>]*?(?:/>|>.*?</xf>)""".r.findAllIn(cx).toVector
    assert(xfs(cellXf(sheetXml, "B2").get).contains("""numFmtId="14""""))
    // values survive: the date still reads back as a date string
    val back = ExcelScan.loadSheet(outP, None)
    assert(back(2, 2) == "2026-03-05" && back(2, 1) == "k1" &&
      back(3, 2) == "plain")
  }

  test("date cells with a highlight style keep both format and fill") {
    val dir = tmpDir
    val p = s"$dir/datefill.xlsx"
    val cells = Seq(Xlsx.Cell(1, 1,
      Xlsx.SDate(Xlsx.dateSerial(LocalDate.of(2026, 7, 1))), style = 2))
    val o = new java.io.FileOutputStream(p)
    try Xlsx.write(o, Seq("S" -> cells.iterator),
      fills = Seq("FFADD8E6", "FFFFC0CB")) finally o.close()
    val sheetXml = zipPart(p, "xl/worksheets/sheet1.xml")
    val stylesXml = zipPart(p, "xl/styles.xml")
    assert(fillOf(stylesXml, cellXf(sheetXml, "A1")) == Some("FFFFC0CB"))
    val cx = stylesXml.substring(stylesXml.indexOf("<cellXfs"),
      stylesXml.indexOf("</cellXfs>"))
    val xfs = """(?s)<xf\b[^>]*?(?:/>|>.*?</xf>)""".r.findAllIn(cx).toVector
    assert(xfs(cellXf(sheetXml, "A1").get).contains("""numFmtId="14""""))
    assert(Xlsx.read(new java.io.FileInputStream(p)).head(1, 1) == "2026-07-01")
  }

  test("dateSerial refuses pre-1900-03-01 dates instead of corrupting") {
    intercept[IllegalArgumentException] {
      Xlsx.dateSerial(LocalDate.of(1900, 2, 28))
    }
    assert(Xlsx.dateSerial(LocalDate.of(1900, 3, 1)) == 61.0)
  }

  test("pre-1900-03-01 dates degrade per-cell to strings; export survives") {
    // the sink must not let dateSerial throw mid-ZIP (truncated workbook,
    // whole export failed for one legacy placeholder date — ADVICE r5):
    // the offending CELL becomes its ISO string, everything else typed
    val dir = tmpDir
    val df = Seq(
      (java.sql.Date.valueOf("1900-01-01"), "legacy"),
      (java.sql.Date.valueOf("2026-03-14"), "modern")).toDF("d", "s")
    val path = s"$dir/legacy.xlsx"
    assert(ExcelSink.writePositional(df, path, startRow = 1) == 2)
    val sheetXml = zipPart(path, "xl/worksheets/sheet1.xml")
    assert(sheetXml.contains("""t="inlineStr"><is><t xml:space="preserve">1900-01-01"""))
    assert(sheetXml.contains("""<c r="A2" s="1"><v>46095</v></c>"""))
    val sheet = ExcelScan.loadSheet(path, None)
    assert(sheet(1, 1) == "1900-01-01") // string cell
    assert(sheet(2, 1) == "2026-03-14") // typed date cell, formatted back
  }

  test("sheet parts resolve via r:id -> rels, not positional numbering") {
    // externally-produced package where workbook order and part file
    // numbering DISAGREE (Excel keeps part names stable across sheet
    // reorder/delete — ADVICE r5): first sheet "Main" lives in
    // sheet2.xml, second sheet "Other" in sheet1.xml
    val dir = tmpDir
    val path = s"$dir/perm.xlsx"
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    def part(name: String, content: String): Unit = {
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/></Types>""")
    part("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    part("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Main" sheetId="1" r:id="rId9"/><sheet name="Other" sheetId="2" r:id="rId3"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId9" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/><Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><fills count="2"><fill><patternFill patternType="none"/></fill><fill><patternFill patternType="gray125"/></fill></fills><cellXfs count="1"><xf/></cellXfs></styleSheet>""")
    part("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>other</t></is></c></row></sheetData></worksheet>""")
    part("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>main</t></is></c></row></sheetData></worksheet>""")
    zout.finish(); zout.close()

    // reader: names associate through rels, not file numbering
    val sheets = Xlsx.read(new java.io.FileInputStream(path))
    assert(sheets.find(_.name == "Main").get(1, 1) == "main")
    assert(sheets.find(_.name == "Other").get(1, 1) == "other")

    // highlighter: patching "Main" must land on sheet2.xml
    val hl = s"$dir/perm_hl.xlsx"
    val os = new java.io.FileOutputStream(hl)
    try Xlsx.highlightCopy(path, os, Some("Main"), Seq("FFFFFF00"),
      Map((1, 1) -> 1))
    finally os.close()
    assert(cellXf(zipPart(hl, "xl/worksheets/sheet2.xml"), "A1").nonEmpty)
    assert(cellXf(zipPart(hl, "xl/worksheets/sheet1.xml"), "A1").isEmpty)
  }

  test("compare pipeline over two workbooks classifies changes (e2e)") {
    val dir = tmpDir
    val q1 = Seq(("k1", "alpha beta"), ("k2", "same")).toDF("id", "val")
    val q2 = Seq(("k1", "alpha GAMMA"), ("k2", "same"), ("k3", "brand new"))
      .toDF("id", "val")
    val p1 = s"$dir/q1.xlsx"; val p2 = s"$dir/q2.xlsx"
    // write with header row so the xlsx reader picks up column names
    def writeWithHeader(df: org.apache.spark.sql.DataFrame, p: String): Unit = {
      val withHdr = ExcelSink.writePositional(df, p, startRow = 2)
      val sheet = ExcelScan.loadSheet(p, None)
      val out = new java.io.FileOutputStream(p)
      val hdr = df.columns.zipWithIndex.map { case (c, i) =>
        Xlsx.Cell(1, i + 1, Xlsx.SStr(c)) }
      val data = for {
        r <- (2 to sheet.maxRow).iterator
        c <- 1 to sheet.maxCol
        if sheet(r, c).nonEmpty
      } yield Xlsx.Cell(r, c, Xlsx.SStr(sheet(r, c)))
      try Xlsx.write(out, Seq("Sheet1" -> (hdr.iterator ++ data)))
      finally out.close()
    }
    writeWithHeader(q1, p1); writeWithHeader(q2, p2)

    val diff = Pipelines.compare(spark, p1, p2, "id", Seq("val"),
      wordDiffCols = Set("val"))
    val byKey = diff.collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(byKey("k1") == "CHANGED")
    assert(byKey("k2") == "UNCHANGED")
    assert(byKey("k3") == "NEW")
    val runs = diff.filter($"key" === "k1")
      .select($"word_runs").as[Seq[(String, Boolean)]].collect()(0)
    assert(runs == Seq(("alpha", false), ("GAMMA", true)))
  }

  test("date/timestamp columns write as typed date cells (S11)") {
    val dir = tmpDir
    val df = Seq((
      java.sql.Date.valueOf("2026-03-14"),
      java.sql.Timestamp.valueOf("2026-03-14 15:09:26"),
      "note")).toDF("d", "ts", "s")
    val path = s"$dir/dates.xlsx"
    ExcelSink.writePositional(df, path, startRow = 1)

    // raw XML: serial-number cells carrying the date / datetime number
    // format (reference writes typed dates, Download.py:188-191) —
    // serial 46095 = 2026-03-14 in the 1900 date system
    val zin = new java.util.zip.ZipInputStream(
      new java.io.FileInputStream(path))
    var sheetXml = ""
    var e = zin.getNextEntry
    while (e != null) {
      if (e.getName == "xl/worksheets/sheet1.xml")
        sheetXml = new String(zin.readAllBytes(), "UTF-8")
      e = zin.getNextEntry
    }
    zin.close()
    assert(sheetXml.contains("""<c r="A1" s="1"><v>46095</v></c>"""),
      sheetXml.take(500))
    assert(sheetXml.contains("""<c r="B1" s="2"><v>46095.6"""),
      sheetXml.take(500))

    // the all-string scan surfaces them as rendered dates, not raw
    // serials (openpyxl-style read behavior)
    val sheet = ExcelScan.loadSheet(path, None)
    assert(sheet(1, 1) == "2026-03-14")
    assert(sheet(1, 2) == "2026-03-14 15:09:26")
    assert(sheet(1, 3) == "note")
  }

  // --- partial rels resolution (ADVICE r6): nonstandard part names and
  // --- unresolvable targets must not silently drop sheets ---

  private def rawZip(path: String, entries: Seq[(String, String)]): Unit = {
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    entries.foreach { case (name, xml) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(xml.getBytes("UTF-8"))
      zout.closeEntry()
    }
    zout.close()
  }

  private def wbXml(names: String*): String = {
    val sheets = names.zipWithIndex.map { case (n, i) =>
      s"""<sheet name="$n" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    s"""<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheets</sheets></workbook>"""
  }

  private def relsXml(targets: String*): String = {
    val rels = targets.zipWithIndex.map { case (t, i) =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="$t"/>"""
    }.mkString
    s"""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>"""
  }

  private def sheetXmlWith(text: String): String =
    s"""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>$text</t></is></c></row></sheetData></worksheet>"""

  test("read resolves rels targets with nonstandard part names") {
    val path = s"$tmpDir/nonstd.xlsx"
    rawZip(path, Seq(
      "xl/workbook.xml" -> wbXml("Alpha", "Beta"),
      "xl/_rels/workbook.xml.rels" ->
        relsXml("worksheets/sheet1.xml", "worksheets/data1.xml"),
      "xl/worksheets/sheet1.xml" -> sheetXmlWith("alpha"),
      "xl/worksheets/data1.xml" -> sheetXmlWith("beta")))
    val sheets = { val in = new java.io.FileInputStream(path)
      try Xlsx.read(in) finally in.close() }
    assert(sheets.map(_.name) == Seq("Alpha", "Beta"))
    assert(sheets(1)(1, 1) == "beta")
  }

  test("read falls back positionally for sheets whose rel is unresolvable") {
    val path = s"$tmpDir/partial.xlsx"
    // Beta's rel points at a part that isn't in the package; the sheet
    // must resolve to the positional part at its workbook index, not
    // vanish from the result
    rawZip(path, Seq(
      "xl/workbook.xml" -> wbXml("Alpha", "Beta"),
      "xl/_rels/workbook.xml.rels" ->
        relsXml("worksheets/sheet1.xml", "worksheets/ghost.xml"),
      "xl/worksheets/sheet1.xml" -> sheetXmlWith("alpha"),
      "xl/worksheets/sheet2.xml" -> sheetXmlWith("beta")))
    val sheets = { val in = new java.io.FileInputStream(path)
      try Xlsx.read(in) finally in.close() }
    assert(sheets.map(_.name) == Seq("Alpha", "Beta"))
    assert(sheets(1)(1, 1) == "beta")
  }
}
