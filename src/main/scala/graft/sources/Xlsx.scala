package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal pure-JDK .xlsx parser (reference: /root/reference/README.md:1-6
  * — the pipeline ingests literature exports from CSV/Excel).
  *
  * An .xlsx file is a zip of XML parts; this reads the shared-strings
  * table plus the first worksheet with the JDK's StAX parser — no
  * third-party dependency, matching the build's no-new-deps constraint.
  * Covers the cell forms tabular exports actually emit: shared strings
  * (`t="s"`), inline strings (`t="inlineStr"`/`t="str"`), numbers, and
  * booleans. Every value surfaces as a string; schema and casting stay
  * with the caller (the same explicit-schema stance as
  * [[Sources.readCsv]] — inference is an extra pass and
  * non-deterministic under sampling).
  *
  * Deliberately NOT handled (fail-soft as empty cells): formulas' cached
  * values are read but formulas are not evaluated; dates arrive as their
  * raw serial numbers (exports that matter write ISO strings); multiple
  * sheets beyond the first are ignored.
  */
object Xlsx {

  /** (header row, data rows) of the first worksheet. Rows are padded /
    * truncated downstream by the caller; cells keep sheet order. */
  def parse(in: InputStream): (Vector[String], Vector[Vector[String]]) = {
    // one pass over the zip stream (entries arrive in archive order, so
    // the sheet may precede sharedStrings): buffer the two parts we need,
    // then parse — a workbook is one task's file, its size bounds memory
    var sharedXml: Array[Byte] = null
    var sheetXml: Array[Byte] = null
    var sheetNum = Long.MaxValue
    val SheetName = "xl/worksheets/sheet([0-9]+)\\.xml".r
    val zip = new ZipInputStream(in)
    try {
      var e = zip.getNextEntry
      while (e != null) {
        e.getName match {
          case "xl/sharedStrings.xml" => sharedXml = zip.readAllBytes()
          case SheetName(n) =>
            // NUMERIC order: "sheet10.xml" < "sheet2.xml" as strings, and
            // a renumbered workbook's first sheet need not be sheet1
            if (n.toLong < sheetNum) { sheetNum = n.toLong; sheetXml = zip.readAllBytes() }
          case _ => ()
        }
        e = zip.getNextEntry
      }
    } finally zip.close()
    require(sheetXml != null, "not an xlsx workbook: no xl/worksheets/sheet*.xml")
    val shared =
      if (sharedXml == null) Vector.empty
      else readSharedStrings(new ByteArrayInputStream(sharedXml))
    val rows = readSheet(new ByteArrayInputStream(sheetXml), shared)
    if (rows.isEmpty) (Vector.empty, Vector.empty) else (rows.head, rows.tail)
  }

  private def xmlFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** sharedStrings.xml: one entry per `<si>`, concatenating its `<t>`
    * runs (plain and rich-text strings alike). */
  private def readSharedStrings(in: InputStream): Vector[String] = {
    val r = xmlFactory.createXMLStreamReader(in)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => cur.clear()
              case "t"  => inT = true
              case _    => ()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t"  => inT = false
              case "si" => out += cur.toString
              case _    => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }

  /** "A" → 0, "AB" → 27: the letters prefix of a cell ref. */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private def readSheet(in: InputStream,
      shared: Vector[String]): Vector[Vector[String]] = {
    val r = xmlFactory.createXMLStreamReader(in)
    val rows = Vector.newBuilder[Vector[String]]
    val cells = mutable.ArrayBuffer.empty[String]
    val text = new StringBuilder
    var cellCol = 0
    var cellType = ""
    var capture = false // inside <v>, or a <t> under <is>
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => cells.clear()
              case "c" =>
                val ref = r.getAttributeValue(null, "r")
                cellCol = if (ref != null) colIndex(ref) else cells.length
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                text.clear()
              case "v" | "t" => capture = true
              case _ => ()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (capture) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" => capture = false
              case "c" =>
                val raw = text.toString
                val value = cellType match {
                  case "s" => shared.lift(raw.trim.toInt).getOrElse("")
                  case "b" => if (raw.trim == "1") "true" else "false"
                  case _   => raw // inlineStr/str captured via <t>/<v>
                }
                // sparse rows skip cells: pad the gap with empties
                while (cells.length < cellCol) cells += ""
                if (cellCol < cells.length) cells(cellCol) = value
                else cells += value
              case "row" => rows += cells.toVector
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    rows.result()
  }
}
