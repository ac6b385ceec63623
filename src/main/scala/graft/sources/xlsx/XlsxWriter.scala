package graft.sources.xlsx

import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal OOXML workbook writer — enough of ECMA-376 to make a real
  * consumer (and this repo's xlsx source) read it: content types, rels,
  * workbook, one sheet, shared strings. Strings go through the
  * shared-string table (the layout Excel itself writes); numbers are plain
  * numeric cells.
  *
  * Promoted from the test fixture to main so the streaming replay can
  * STAGE real workbooks from inside executors (the reference emits `.xlsx`
  * by hand, `pro.py:96-108` just watches them appear — the writer here
  * exists for fixture staging and round-trip tests, not as a reference
  * feature). One workbook is one in-memory sheet, capped at
  * [[MaxSheetRows]] (ENFORCED in writeTo, not just assumed), so the
  * builder's memory use is bounded the same way the reader's is. */
object XlsxWriter {

  /** ECMA-376 / Excel sheet capacity (2^20 rows). Enforced, not just
    * claimed: a sheet past it would open broken in Excel itself, and the
    * staging path's memory bound is only as real as this check (review
    * finding) — an oversized partition must fail LOUD ("split across more
    * workbooks"), not emit an unopenable file. */
  val MaxSheetRows: Int = 1048576

  /** Write `rows` (first row = header by convention) as one workbook to a
    * local filesystem path. */
  def write(path: String, rows: Seq[Seq[Any]]): Unit = {
    val out = new java.io.FileOutputStream(path)
    try writeTo(out, rows) finally out.close()
  }

  /** Write one workbook to an open stream (callers own the stream — the
    * executor-side staging path opens it via the Hadoop FileSystem so the
    * same code lands workbooks on a cluster store). */
  def writeTo(out: java.io.OutputStream, rows: Seq[Seq[Any]]): Unit = {
    require(rows.size <= MaxSheetRows,
      s"xlsx sheet cap is $MaxSheetRows rows, got ${rows.size} — split the " +
        "corpus across more workbooks (e.g. a larger nFiles)")
    val shared = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    // ECMA-376 distinguishes count (total string-cell REFERENCES) from
    // uniqueCount (distinct <si> entries) — strict validators cross-check.
    var stringCells = 0
    def sharedIdx(s: String): Int = {
      stringCells += 1
      shared.getOrElseUpdate(s, shared.size)
    }

    def cellXml(ref: String, v: Any): String = v match {
      case null => ""
      case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Double =>
        // NaN/Infinity are not valid OOXML numbers — Excel reports the file
        // as corrupt on open. Same fail-loud rule as the row cap and the
        // `other` arm: never emit an unopenable workbook (review finding).
        if (n.isNaN || n.isInfinite)
          sys.error(s"xlsx numeric cell cannot hold $n (not a valid OOXML " +
            "number) — write a string representation instead")
        s"""<c r="$ref"><v>$n</v></c>"""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case s: String => s"""<c r="$ref" t="s"><v>${sharedIdx(s)}</v></c>"""
      case other => sys.error(s"unsupported xlsx cell value: $other")
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

    // Close-shield: callers own `out` (doc above), but the zip must be
    // close()d — not just finish()ed — because ZipOutputStream only end()s
    // its internal default Deflater in close(); finish() alone would leak
    // the deflater's native zlib buffers until GC, once per staged
    // workbook (review finding). The shield turns the propagated close
    // into a flush and delegates bulk writes (FilterOutputStream's
    // default is a byte-at-a-time loop).
    val zip = new ZipOutputStream(new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = out.flush()
    })

    def entry(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(body.getBytes("UTF-8"))
      zip.closeEntry()
    }
    def runWrites(): Unit = {
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
           |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="$stringCells" uniqueCount="${shared.size}">$sst</sst>""".stripMargin)
    }

    try {
      runWrites()
      zip.close() // ends the deflater; the shield keeps `out` open
    } catch { case t: Throwable =>
      // A mid-write failure (disk full, DFS quota) must still end() the
      // deflater, but the close flushes to the same broken stream and can
      // throw a SECOND exception — suppress it under the root cause
      // instead of letting it replace it (review finding).
      try zip.close() catch { case c: Throwable if c ne t => t.addSuppressed(c) }
      throw t
    }
  }
}
