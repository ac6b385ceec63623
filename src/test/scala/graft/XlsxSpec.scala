package graft

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

/** Minimal OOXML workbook writer (tests only): enough of ECMA-376 to make a
  * real consumer (and this repo's xlsx source) read it — content types, rels,
  * workbook, one sheet, shared strings. Strings go through the shared-string
  * table (the layout Excel itself writes); numbers are plain numeric cells. */
object XlsxTestFixture {
  def write(path: String, rows: Seq[Seq[Any]]): Unit = {
    val shared = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int = shared.getOrElseUpdate(s, shared.size)

    def cellXml(ref: String, v: Any): String = v match {
      case null => ""
      case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case s: String => s"""<c r="$ref" t="s"><v>${sharedIdx(s)}</v></c>"""
      case other => sys.error(s"unsupported fixture cell: $other")
    }
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheetRows = rows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.map { case (v, c) => cellXml(s"${colRef(c)}${r + 1}", v) }
      s"""<row r="${r + 1}">${cs.mkString}</row>"""
    }.mkString
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    val zip = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(body.getBytes("UTF-8"))
      zip.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$sheetRows</sheetData>
         |</worksheet>""".stripMargin)
    val sst = shared.keysIterator
      .map(s => s"<si><t xml:space=\"preserve\">${esc(s)}</t></si>").mkString
    entry("xl/sharedStrings.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${shared.size}" uniqueCount="${shared.size}">$sst</sst>""".stripMargin)
    zip.close()
  }
}

/** S1 via a real `.xlsx`: the reference ingests Excel workbooks
  * (`pro.py:34-44` — header row, stringified cells, skip all-blank rows).
  * These tests read generated OOXML fixtures through `.format("xlsx")` and
  * pin parity with the csv path plus the pro.py blank-row contract. */
class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("xlsx").toFile
    d.deleteOnExit(); d
  }

  private val data: Seq[Seq[Any]] = Seq(
    Seq("masv", "tenmh", "diem2", "note"),
    Seq("SV001", "Cơ sở dữ liệu", 8.5, "đạt"),
    Seq("SV002", "Mạng máy tính", 4.0, null),
    Seq(null, null, null, null), // all-blank row: pro.py drops it
    Seq("SV003", "A&B <lab>", 9, "kept"))

  test("reads header, shared strings, numerics, Vietnamese text") {
    val d = tmpDir()
    val f = new java.io.File(d, "wb1.xlsx").getAbsolutePath
    XlsxTestFixture.write(f, data)
    val df = spark.read.format("xlsx").load(f)
    assert(df.columns.toSeq == Seq("masv", "tenmh", "diem2", "note"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.collect()
    assert(rows.length == 4) // 3 data rows + 1 blank (source keeps it; etl drops it)
    val r0 = rows(0)
    assert(r0.getString(0) == "SV001" && r0.getString(1) == "Cơ sở dữ liệu" &&
      r0.getString(2) == "8.5" && r0.getString(3) == "đạt")
    assert(rows(3).getString(1) == "A&B <lab>") // xml-escaped roundtrip
  }

  test("blank-row drop matches the pro.py contract via Ingest.dropBlankRows") {
    val d = tmpDir()
    val f = new java.io.File(d, "wb1.xlsx").getAbsolutePath
    XlsxTestFixture.write(f, data)
    val cleaned = graft.etl.Ingest.dropBlankRows(spark.read.format("xlsx").load(f))
    assert(cleaned.count() == 3)
    assert(cleaned.filter(col("masv").isNull).count() == 0)
  }

  test("directory read unions files, one partition per workbook") {
    val d = tmpDir()
    XlsxTestFixture.write(new java.io.File(d, "a.xlsx").getAbsolutePath,
      Seq(Seq("k", "v"), Seq("a", 1)))
    XlsxTestFixture.write(new java.io.File(d, "b.xlsx").getAbsolutePath,
      Seq(Seq("k", "v"), Seq("b", 2)))
    val df = spark.read.format("xlsx").load(d.getAbsolutePath)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.orderBy("k").as[(String, String)].collect().toSeq ==
      Seq(("a", "1"), ("b", "2")))
  }

  test("xlsx scan equals the csv scan of the same table") {
    val d = tmpDir()
    val f = new java.io.File(d, "wb.xlsx").getAbsolutePath
    XlsxTestFixture.write(f, data)
    val csv = new java.io.File(d, "t.csv")
    val pw = new java.io.PrintWriter(csv, "UTF-8")
    pw.println("masv,tenmh,diem2,note")
    pw.println("SV001,Cơ sở dữ liệu,8.5,đạt")
    pw.println("SV002,Mạng máy tính,4.0,")
    pw.println(",,,")
    pw.println("SV003,A&B <lab>,9,kept")
    pw.close()
    val fromXlsx = graft.etl.Ingest.dropBlankRows(spark.read.format("xlsx").load(f))
      .na.fill("") // csv reads missing as null too; normalize both
    val fromCsv = graft.etl.Ingest.dropBlankRows(
        spark.read.option("header", "true")
          .schema(fromXlsx.schema).csv(csv.getAbsolutePath))
      .na.fill("")
    // 9 vs 9.0: numeric cells keep their literal form in both sources
    assert(fromXlsx.exceptAll(fromCsv).isEmpty && fromCsv.exceptAll(fromXlsx).isEmpty)
  }

  test("header=false and sheet selection options") {
    val d = tmpDir()
    val f = new java.io.File(d, "wb.xlsx").getAbsolutePath
    XlsxTestFixture.write(f, Seq(Seq("x", "y"), Seq("1", "2")))
    val df = spark.read.format("xlsx").option("header", "false").load(f)
    assert(df.columns.toSeq == Seq("_c0", "_c1"))
    assert(df.count() == 2)
  }
}
