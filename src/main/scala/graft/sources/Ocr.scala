package graft.sources

/** Deterministic OCR over the JDK codecs — the scanned-page half of the
  * reference's deep parsing mode (Docling `do_ocr`, reference:
  * src/server/app/embed/document.py:192-222), made oracle-checkable
  * without external vision models: pages are rendered with a FIXED 5×7
  * bitmap font ([[Font5x7]]) and read back by exact template matching
  * against the same font. `ocrImage(renderPage(text)) == normalize(text)`
  * holds by construction (every glyph is distinct, spec-pinned), so the
  * whole render → PNG/GIF encode → decode → segment → match loop is REAL
  * and gated by a corpus-scale query — what a production OCR slot would
  * do with a vision model, with the model swapped for the one recognizer
  * that is bit-exact and engine-replayable.
  *
  * Layout contract: glyphs are 5×7 with a 1-px gap (6-px pitch), lines
  * are 7 px tall with a 1-px gap (8-px pitch), background 255, ink 0.
  * The recognizer requires only that contract — it segments by pitch, so
  * any image produced by any renderer honoring it reads back exactly.
  */
object Ocr {

  /** Classic 5×7 dot-matrix glyphs for A-Z, 0-9 and space, one Long of 35
    * bits per glyph (row-major, bit 34 = top-left). All 37 are pairwise
    * distinct (spec-pinned), which makes template matching exact. */
  object Font5x7 {
    private val rows: Map[Char, Seq[String]] = Map(
      'A' -> Seq("01110", "10001", "10001", "11111", "10001", "10001", "10001"),
      'B' -> Seq("11110", "10001", "11110", "10001", "10001", "10001", "11110"),
      'C' -> Seq("01110", "10001", "10000", "10000", "10000", "10001", "01110"),
      'D' -> Seq("11110", "10001", "10001", "10001", "10001", "10001", "11110"),
      'E' -> Seq("11111", "10000", "11110", "10000", "10000", "10000", "11111"),
      'F' -> Seq("11111", "10000", "11110", "10000", "10000", "10000", "10000"),
      'G' -> Seq("01110", "10001", "10000", "10111", "10001", "10001", "01111"),
      'H' -> Seq("10001", "10001", "11111", "10001", "10001", "10001", "10001"),
      'I' -> Seq("01110", "00100", "00100", "00100", "00100", "00100", "01110"),
      'J' -> Seq("00111", "00010", "00010", "00010", "00010", "10010", "01100"),
      'K' -> Seq("10001", "10010", "10100", "11000", "10100", "10010", "10001"),
      'L' -> Seq("10000", "10000", "10000", "10000", "10000", "10000", "11111"),
      'M' -> Seq("10001", "11011", "10101", "10101", "10001", "10001", "10001"),
      'N' -> Seq("10001", "11001", "10101", "10011", "10001", "10001", "10001"),
      'O' -> Seq("01110", "10001", "10001", "10001", "10001", "10001", "01110"),
      'P' -> Seq("11110", "10001", "10001", "11110", "10000", "10000", "10000"),
      'Q' -> Seq("01110", "10001", "10001", "10001", "10101", "10010", "01101"),
      'R' -> Seq("11110", "10001", "10001", "11110", "10100", "10010", "10001"),
      'S' -> Seq("01111", "10000", "10000", "01110", "00001", "00001", "11110"),
      'T' -> Seq("11111", "00100", "00100", "00100", "00100", "00100", "00100"),
      'U' -> Seq("10001", "10001", "10001", "10001", "10001", "10001", "01110"),
      'V' -> Seq("10001", "10001", "10001", "10001", "10001", "01010", "00100"),
      'W' -> Seq("10001", "10001", "10001", "10101", "10101", "11011", "10001"),
      'X' -> Seq("10001", "10001", "01010", "00100", "01010", "10001", "10001"),
      'Y' -> Seq("10001", "10001", "01010", "00100", "00100", "00100", "00100"),
      'Z' -> Seq("11111", "00001", "00010", "00100", "01000", "10000", "11111"),
      '0' -> Seq("01110", "10001", "10011", "10101", "11001", "10001", "01110"),
      '1' -> Seq("00100", "01100", "00100", "00100", "00100", "00100", "01110"),
      '2' -> Seq("01110", "10001", "00001", "00110", "01000", "10000", "11111"),
      '3' -> Seq("11111", "00010", "00100", "00010", "00001", "10001", "01110"),
      '4' -> Seq("00010", "00110", "01010", "10010", "11111", "00010", "00010"),
      '5' -> Seq("11111", "10000", "11110", "00001", "00001", "10001", "01110"),
      '6' -> Seq("00110", "01000", "10000", "11110", "10001", "10001", "01110"),
      '7' -> Seq("11111", "00001", "00010", "00100", "01000", "01000", "01000"),
      '8' -> Seq("01110", "10001", "10001", "01110", "10001", "10001", "01110"),
      '9' -> Seq("01110", "10001", "10001", "01111", "00001", "00010", "01100"),
      ' ' -> Seq("00000", "00000", "00000", "00000", "00000", "00000", "00000"))

    val glyphs: Map[Char, Long] = rows.map { case (c, rs) =>
      c -> java.lang.Long.parseLong(rs.mkString, 2)
    }
    /** Match order is fixed (char order) so ties — impossible with exact
      * matching, but the recognizer is nearest-template — are stable. */
    val order: IndexedSeq[(Char, Long)] =
      glyphs.toIndexedSeq.sortBy(_._1)
  }

  val GlyphW = 5; val GlyphH = 7
  val PitchX = 6; val PitchY = 8

  /** The renderable alphabet: uppercase letters pass through, lowercase
    * upcase, everything else becomes a space. SQL-expressible
    * (`regexp_replace(upper(x), '[^A-Z0-9 ]', ' ')`), which is what lets
    * a DuckDB oracle state the expected OCR output without seeing pixels. */
  def normalize(text: String): String =
    text.toUpperCase.map(c => if (Font5x7.glyphs.contains(c)) c else ' ')

  /** Render normalized text as a multi-line gray page (background 255,
    * ink 0), `cols` glyphs per line: width = 6·cols − 1, height = 8·rows
    * − 1. Returns (width, height, pixels). */
  def renderPage(text: String, cols: Int): (Int, Int, Array[Int]) = {
    val norm = normalize(text)
    val lines = norm.grouped(cols).toSeq match {
      case Seq() => Seq(" " * cols)
      case ls => ls.map(_.padTo(cols, ' '))
    }
    val w = PitchX * cols - 1
    val h = PitchY * lines.length - 1
    val px = Array.fill(w * h)(255)
    for ((line, row) <- lines.zipWithIndex; (ch, colIdx) <- line.zipWithIndex) {
      val g = Font5x7.glyphs.getOrElse(ch, 0L)
      var bit = 34
      var gy = 0
      while (gy < GlyphH) {
        var gx = 0
        while (gx < GlyphW) {
          if (((g >> bit) & 1L) == 1L) {
            val x = colIdx * PitchX + gx
            val y = row * PitchY + gy
            px(y * w + x) = 0
          }
          bit -= 1; gx += 1
        }
        gy += 1
      }
    }
    (w, h, px)
  }

  /** Render to a lossless PNG page. */
  def renderPagePng(text: String, cols: Int): Array[Byte] = {
    val (w, h, px) = renderPage(text, cols)
    BinaryMedia.encodeGrayPng(w, h, px)
  }

  /** Read a page back: segment by the fixed pitch, binarize at 128,
    * nearest-template match per cell (exact for images produced by
    * [[renderPage]]). Trailing pad spaces per line are kept — callers
    * compare against `normalize(text)` padded to the line grid, or trim.
    * None when the image doesn't honor the layout contract. */
  def ocrImage(img: BinaryMedia.GrayImage): Option[String] = {
    if ((img.width + 1) % PitchX != 0 || (img.height + 1) % PitchY != 0)
      return None
    val cols = (img.width + 1) / PitchX
    val rows = (img.height + 1) / PitchY
    val sb = new StringBuilder
    var row = 0
    while (row < rows) {
      var c = 0
      while (c < cols) {
        var cell = 0L
        var gy = 0
        while (gy < GlyphH) {
          var gx = 0
          while (gx < GlyphW) {
            val x = c * PitchX + gx
            val y = row * PitchY + gy
            cell = (cell << 1) |
              (if (img.gray(y * img.width + x) < 128) 1L else 0L)
            gx += 1
          }
          gy += 1
        }
        // nearest template by Hamming distance over the 35 glyph bits
        var best = ' '; var bestD = Integer.MAX_VALUE
        Font5x7.order.foreach { case (ch, g) =>
          val d = java.lang.Long.bitCount(cell ^ g)
          if (d < bestD) { best = ch; bestD = d }
        }
        sb += best
        c += 1
      }
      if (row < rows - 1) sb += '\n'
      row += 1
    }
    Some(sb.toString)
  }

  /** OCR encoded image bytes (PNG/GIF/BMP — any [[BinaryMedia]] format),
    * trailing pad stripped per line. None on undecodable bytes or a
    * layout-contract violation. */
  def ocrBytes(bytes: Array[Byte]): Option[String] =
    BinaryMedia.decodeGrayImage(bytes).flatMap(ocrImage)
      .map(_.split("\n", -1).map(l =>
        l.reverse.dropWhile(_ == ' ').reverse).mkString("\n"))
}
