package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{Inflater, ZipInputStream}
import scala.collection.mutable.ArrayBuffer

/** JDK-only text extraction for the binary document formats the reference
  * loads with pypdf/python-docx/pptx/openpyxl
  * (reference: src/server/app/embed/document.py:133-189).
  *
  * No external codec is needed for the common cases: DOCX/PPTX/XLSX are
  * ZIP archives of XML (`java.util.zip.ZipInputStream` + entity-aware tag
  * scraping), and PDF page content lives in Flate-compressed streams
  * (`java.util.zip.Inflater`) holding `Tj`/`TJ` text-showing operators.
  * These extractors cover exactly that: machine-generated office files and
  * simple/linear PDFs. Out of scope (documented, returns empty → callers
  * fall back to a typed marker): encrypted PDFs, CID/Type0 composite
  * fonts, object streams (XRef streams are fine — content streams are
  * found by scanning, not via the xref), OOXML with field codes, XLSX
  * numeric-only sheets (only shared strings are read).
  */
object BinaryText {

  private def unescapeXml(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&apos;", "'")
    .replace("&amp;", "&") // last, so &amp;lt; round-trips correctly

  /** All zip entries matching `want` as (name, content) — streaming read,
    * malformed archives simply yield fewer (or zero) entries. */
  private def zipEntries(bytes: Array[Byte], want: String => Boolean): Seq[(String, String)] = {
    val out = ArrayBuffer.empty[(String, String)]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && want(e.getName)) {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n > 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
          out += ((e.getName, new String(buf.toByteArray, "UTF-8")))
        }
        e = zin.getNextEntry
      }
    } catch { case _: Exception => /* truncated/corrupt zip: keep what we have */ }
    finally zin.close()
    out.toSeq
  }

  private val WT = "(?s)<w:t[^>]*>(.*?)</w:t>".r
  private val AT = "(?s)<a:t[^>]*>(.*?)</a:t>".r
  private val ST = "(?s)<t[^>]*>(.*?)</t>".r
  private val SlideName = "ppt/slides/slide(\\d+)\\.xml".r

  /** DOCX: word/document.xml — `<w:t>` runs concatenated per paragraph
    * (`</w:p>` boundaries), paragraphs joined by newlines. */
  def extractDocx(bytes: Array[Byte]): String = {
    val doc = zipEntries(bytes, _ == "word/document.xml").map(_._2).mkString
    doc.split("</w:p>").iterator
      .map(p => WT.findAllMatchIn(p).map(m => unescapeXml(m.group(1))).mkString)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /** PPTX: ppt/slides/slideN.xml in slide order — `<a:t>` runs joined by
    * spaces within a slide, slides separated by blank lines. */
  def extractPptx(bytes: Array[Byte]): String =
    zipEntries(bytes, n => SlideName.pattern.matcher(n).matches())
      .map { case (name, xml) =>
        val SlideName(n) = name
        (n.toInt, AT.findAllMatchIn(xml).map(m => unescapeXml(m.group(1))).mkString(" "))
      }
      .sortBy(_._1).map(_._2).filter(_.nonEmpty).mkString("\n\n")

  private val SheetName = "xl/worksheets/sheet(\\d+)\\.xml".r
  private val RowXml = "(?s)<row[^>]*>(.*?)</row>".r
  private val CellXml = "(?s)<c([^>]*)>(.*?)</c>".r
  private val CellV = "(?s)<v[^>]*>(.*?)</v>".r

  /** XLSX: reconstruct the cell grid per worksheet (sheets in numeric
    * order) — shared-string cells (`t="s"`) resolve through
    * xl/sharedStrings.xml, other cells take their raw `<v>` value;
    * cells join by tabs, rows by newlines, sheets by blank lines — the
    * row-wise text an openpyxl-style fast loader yields. Workbooks with
    * no worksheet entries fall back to the shared-string table alone. */
  def extractXlsx(bytes: Array[Byte]): String = {
    val shared: IndexedSeq[String] =
      zipEntries(bytes, _ == "xl/sharedStrings.xml").map(_._2).mkString match {
        case "" => IndexedSeq.empty
        case xml => ST.findAllMatchIn(xml).map(m => unescapeXml(m.group(1))).toIndexedSeq
      }
    val sheets = zipEntries(bytes, n => SheetName.pattern.matcher(n).matches())
      .map { case (name, xml) =>
        val SheetName(n) = name
        val rows = RowXml.findAllMatchIn(xml).map { r =>
          CellXml.findAllMatchIn(r.group(1)).flatMap { c =>
            val v = CellV.findFirstMatchIn(c.group(2)).map(_.group(1))
            if (c.group(1).contains("t=\"s\""))
              v.flatMap(i => shared.lift(i.trim.toInt))
            else v.map(unescapeXml)
          }.mkString("\t")
        }.filter(_.nonEmpty).mkString("\n")
        (n.toInt, rows)
      }
      .sortBy(_._1).map(_._2).filter(_.nonEmpty)
    if (sheets.nonEmpty) sheets.mkString("\n\n")
    else shared.filter(_.nonEmpty).mkString("\n")
  }

  /** PDF: scan for `stream … endstream` segments, inflate each (raw bytes
    * kept when not Flate), then pull `(…) Tj` / `[…] TJ` text-showing
    * operators with PDF string unescaping. Simple/linear PDFs only — see
    * class doc for the excluded cases. */
  def extractPdf(bytes: Array[Byte]): String = {
    val latin = new String(bytes, "ISO-8859-1")
    val segments = ArrayBuffer.empty[String]
    var from = 0
    while ({ val i = latin.indexOf("stream", from); i >= 0 && {
      val contentStart = {
        var j = i + "stream".length
        if (j < latin.length && latin(j) == '\r') j += 1
        if (j < latin.length && latin(j) == '\n') j += 1
        j
      }
      val end = latin.indexOf("endstream", contentStart)
      if (end < 0) { from = latin.length; false }
      else {
        val raw = bytes.slice(contentStart, end)
        segments += inflateOrRaw(raw)
        from = end + "endstream".length
        true
      }
    } }) ()
    // content outside streams too (fully uncompressed micro-PDFs)
    val searchSpace = if (segments.isEmpty) Seq(latin) else segments.toSeq
    val out = ArrayBuffer.empty[String]
    val tj = "\\(((?:\\\\.|[^\\\\()])*)\\)\\s*Tj".r
    val tjArr = "\\[((?:\\\\.|[^\\\\\\]])*)\\]\\s*TJ".r
    val inParens = "\\(((?:\\\\.|[^\\\\()])*)\\)".r
    searchSpace.foreach { seg =>
      tj.findAllMatchIn(seg).foreach(m => out += unescapePdf(m.group(1)))
      tjArr.findAllMatchIn(seg).foreach { m =>
        val run = inParens.findAllMatchIn(m.group(1))
          .map(x => unescapePdf(x.group(1))).mkString
        if (run.nonEmpty) out += run
      }
    }
    out.filter(_.nonEmpty).mkString(" ")
  }

  /** Deep-parse structurer — the TEXT-level half of the reference's deep
    * parsing mode (Docling markdown export, embed/document.py:192-222):
    * reconstruct document STRUCTURE from already-extracted text as
    * markdown. Runs of tab-separated lines (the XLSX/CSV grid shape)
    * become GitHub tables, heading-like lines (short, letterful, no
    * sentence punctuation, ALL-CAPS or every word capitalized) get `##`,
    * and bullet variants normalize to `-`. Deterministic rules, so specs
    * replay it exactly. Actual OCR of scanned pages needs a vision
    * model and remains out of scope (SURVEY §2.1 S5). */
  def structureMarkdown(text: String): String = {
    val lines = text.split("\n", -1)
    val out = ArrayBuffer.empty[String]
    def isHeading(t: String): Boolean =
      t.nonEmpty && t.length <= 60 && !t.exists(c => ".!?;:,".contains(c)) &&
        t.exists(_.isLetter) &&
        (t == t.toUpperCase ||
          t.split("\\s+").forall(_.headOption.exists(c => c.isUpper || c.isDigit)))
    var i = 0
    while (i < lines.length) {
      if (lines(i).contains('\t')) {
        val start = i
        while (i < lines.length && lines(i).contains('\t')) i += 1
        val rows = lines.slice(start, i).map(_.split("\t", -1).toSeq)
        val width = rows.map(_.length).max
        def row(r: Seq[String]) = r.padTo(width, "").mkString("| ", " | ", " |")
        out += row(rows.head)
        out += Seq.fill(width)("---").mkString("| ", " | ", " |")
        rows.tail.foreach(r => out += row(r))
      } else {
        val t = lines(i).trim
        if (t.startsWith("- ") || t.startsWith("* ") || t.startsWith("• "))
          out += ("- " + t.drop(2).trim)
        else if (isHeading(t)) out += ("## " + t)
        else out += lines(i)
        i += 1
      }
    }
    out.mkString("\n")
  }

  private def inflateOrRaw(raw: Array[Byte]): String = {
    val inf = new Inflater()
    try {
      inf.setInput(raw)
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = inf.inflate(chunk)
      while (n > 0) { buf.write(chunk, 0, n); n = inf.inflate(chunk) }
      if (buf.size() > 0) new String(buf.toByteArray, "ISO-8859-1")
      else new String(raw, "ISO-8859-1")
    } catch {
      case _: Exception => new String(raw, "ISO-8859-1") // not Flate: use raw
    } finally inf.end()
  }

  private def unescapePdf(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case d if d >= '0' && d <= '7' =>
            val oct = s.substring(i + 1, math.min(i + 4, s.length)).takeWhile(ch => ch >= '0' && ch <= '7')
            sb += Integer.parseInt(oct, 8).toChar
            i += 1 + oct.length
          case other => sb += other; i += 2 // \( \) \\ and friends
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
