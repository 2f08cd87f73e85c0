package graft

import graft.sources.{BinaryMedia, DocumentSource, Ocr}

class OcrSpec extends SparkSpec {

  test("font: all 37 glyphs are pairwise distinct (exact matching is sound)") {
    val gs = Ocr.Font5x7.glyphs
    assert(gs.size == 37)
    assert(gs.values.toSeq.distinct.size == 37)
    // every glyph fits 35 bits, space is blank
    assert(gs.values.forall(g => g >= 0L && g < (1L << 35)))
    assert(gs(' ') == 0L)
  }

  test("ocr(render(text)) == normalize(text) incl. multi-line and pad") {
    val text = "Hello, Spark 4.1!  mixed-CASE & digits 0189"
    val png = Ocr.renderPagePng(text, cols = 16)
    val got = Ocr.ocrBytes(png).get
    val norm = Ocr.normalize(text)
    // per-line: trailing pad stripped, interior spaces kept
    val expLines = norm.grouped(16).toSeq.map(_.padTo(16, ' '))
      .map(l => l.reverse.dropWhile(_ == ' ').reverse)
    assert(got.split("\n", -1).toSeq == expLines)
    // the untrimmed grid (ocrColumn's contract) reconstructs the page
    // character stream exactly — this is what q379 gates corpus-wide
    val grid = Ocr.ocrBytes(png).map(_ => // re-read without trim
      BinaryMedia.decodeGrayImage(png).flatMap(Ocr.ocrImage).get).get
    assert(grid.replace("\n", "") == norm.padTo(
      ((norm.length + 15) / 16) * 16, ' '))
  }

  test("ocr survives the lossless GIF leg and rejects contract violations") {
    val (w, h, px) = Ocr.renderPage("GIF ROUND TRIP 42", cols = 17)
    val gif = BinaryMedia.encodeGrayGif(w, h, px)
    assert(Ocr.ocrBytes(gif).contains("GIF ROUND TRIP 42"))
    // wrong-pitch image: not a page, recognizer declines
    val offContract = BinaryMedia.encodeGrayPng(10, 10, Array.fill(100)(255))
    assert(Ocr.ocrBytes(offContract).isEmpty)
    assert(Ocr.ocrBytes(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("loadCorpus(deep=true) OCRs page images; fast mode still skips them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ocr_corpus").toFile
    java.nio.file.Files.write(
      new java.io.File(dir, "scan.png").toPath,
      Ocr.renderPagePng("SCANNED PAGE 7", cols = 14))
    java.nio.file.Files.write(
      new java.io.File(dir, "plain.txt").toPath, "plain".getBytes("UTF-8"))
    val deep = DocumentSource.loadCorpus(spark, dir.getAbsolutePath, deep = true)
      .select("filename", "text", "parse_ok").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(deep("scan.png") == (("SCANNED PAGE 7", true)))
    assert(deep("plain.txt")._2)
    val fast = DocumentSource.loadCorpus(spark, dir.getAbsolutePath)
      .select("filename", "parse_ok", "skip_reason").collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(fast("scan.png")._1 == false)
    assert(fast("scan.png")._2.contains("unsupported"))
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
