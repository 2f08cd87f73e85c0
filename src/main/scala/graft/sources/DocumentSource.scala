package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-corpus ingest (reference S1-S6, S10).
  *
  * The reference loads PDFs/DOCX/PPTX/XLSX/HTML/CSV/TXT/MD per file with a
  * per-extension dispatch map and a fast/deep parsing mode
  * (reference: src/server/app/embed/document.py:133-222, dispatch :184-189;
  * load driver :254-320). On Spark the idiomatic equivalent is
  * `spark.read.format("binaryFile")` (distributed listing + reading via the
  * Hadoop FS layer — the same layer that reads object storage at cluster
  * scale) plus an extension-dispatched parse function per row.
  *
  * Text-native formats parse directly; the binary formats (pdf/docx/pptx/
  * xlsx) extract for REAL via the JDK-only [[BinaryText]] parsers (zip+XML
  * for OOXML, Flate streams + Tj/TJ operators for PDF). A file whose
  * extraction yields no text (scanned/encrypted PDF, numeric-only XLSX,
  * corrupt archive) degrades to a typed `[<ext>-no-text bytes=N]` marker
  * with `parse_ok = true` — the file was read and dispatched; it simply
  * carries no extractable text, mirroring the reference's behavior of
  * indexing whatever the fast loader returns.
  */
object DocumentSource {

  private def orMarker(kind: String, b: Array[Byte], text: String): String =
    if (text.trim.nonEmpty) text else s"[$kind-no-text bytes=${b.length}]"

  /** Extension-dispatch parse map (the reference's FAST_LOADERS analog). */
  val parsers: Map[String, Array[Byte] => String] = Map(
    "txt" -> (b => new String(b, "UTF-8")),
    "md" -> (b => new String(b, "UTF-8")),
    "csv" -> (b => new String(b, "UTF-8").linesIterator.mkString("\n")),
    "html" -> (b => WebScrape.extractSections(new String(b, "UTF-8"))
      .map { case (t, c) => if (t.nonEmpty) s"$t\n$c" else c }.mkString("\n\n")),
    "pdf" -> (b => orMarker("pdf", b, BinaryText.extractPdf(b))),
    "docx" -> (b => orMarker("docx", b, BinaryText.extractDocx(b))),
    "pptx" -> (b => orMarker("pptx", b, BinaryText.extractPptx(b))),
    "xlsx" -> (b => orMarker("xlsx", b, BinaryText.extractXlsx(b))))

  private def ext(path: String): String = {
    val i = path.lastIndexOf('.')
    if (i < 0) "" else path.substring(i + 1).toLowerCase
  }

  /** Flatten an object key to a local-safe name: `a/b.txt → a_b.txt`
    * (reference S10, oci/bucket.py:121-124). */
  def flattenName(key: String): String = key.replaceAll("/", "_")

  /** Distributed listing of a corpus directory: (name, size, time_modified,
    * etag) — the change-detection input shape. The etag is a deterministic
    * content-stat digest (path+size+mtime), standing in for the object
    * store's etag (reference oci/bucket.py:89-118). */
  def listFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/$glob")
      .select(col("path"), col("length"), col("modificationTime"))
      .as[(String, Long, java.sql.Timestamp)]
      .map { case (p, len, mt) =>
        val name = flattenName(p.replaceFirst("^file:", "").split('/').takeRight(2).mkString("/"))
        val etag = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p:$len:${mt.getTime}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (name, len, mt.getTime.toString, etag)
      }.toDF("name", "size", "time_modified", "etag")
  }

  /** Load + parse a corpus: one row per file with (path, filename, ext,
    * size, time_modified, text, parse_ok). Unknown extensions yield
    * parse_ok=false with a reason — the reference's skipped_files
    * accounting (document.py:271-318, A8). `deep = true` is the
    * reference's deep parsing mode: extracted text additionally passes
    * [[BinaryText.structureMarkdown]] (tables/headings/lists as
    * markdown — the Docling-export shape, minus OCR). */
  def loadCorpus(spark: SparkSession, dir: String, glob: String = "*",
                 deep: Boolean = false): DataFrame = {
    val raw = spark.read.format("binaryFile").load(s"$dir/$glob")
      .select(col("path"), col("length").as("size"),
        col("modificationTime").as("time_modified"), col("content"))
    val schema = StructType(Seq(
      StructField("path", StringType), StructField("filename", StringType),
      StructField("ext", StringType), StructField("size", LongType),
      StructField("time_modified", TimestampType),
      StructField("text", StringType),
      StructField("parse_ok", BooleanType, nullable = false),
      StructField("skip_reason", StringType)))
    val enc = RowEncoder.encoderFor(schema)
    raw.mapPartitions { it =>
      it.map { r =>
        val path = r.getString(0)
        val fname = path.split('/').last
        val e = ext(fname)
        val bytes = r.getAs[Array[Byte]]("content")
        parsers.get(e) match {
          case Some(p) =>
            try {
              val text = if (deep) BinaryText.structureMarkdown(p(bytes)) else p(bytes)
              Row(path, fname, e, r.getLong(1), r.getTimestamp(2), text, true, null)
            } catch { case ex: Exception =>
              Row(path, fname, e, r.getLong(1), r.getTimestamp(2), null, false,
                s"parse-error: ${ex.getMessage}")
            }
          // deep mode OCRs scanned-page images (the reference's Docling
          // do_ocr path, document.py:192-222) via the deterministic
          // fixed-font recognizer — real decode + segment + match, gated
          // by q379's render→ocr corpus round-trip
          case None if deep && Set("png", "gif", "bmp").contains(e) =>
            Ocr.ocrBytes(bytes) match {
              case Some(text) =>
                Row(path, fname, e, r.getLong(1), r.getTimestamp(2),
                  text, true, null)
              case None =>
                Row(path, fname, e, r.getLong(1), r.getTimestamp(2), null,
                  false, "ocr-failed: undecodable or non-page layout")
            }
          case None =>
            Row(path, fname, e, r.getLong(1), r.getTimestamp(2), null, false,
              s"unsupported extension: $e")
        }
      }
    }(enc)
  }

  /** Processing summary (reference A8): processed/skipped counts. */
  def summary(corpus: DataFrame): DataFrame =
    corpus.groupBy(when(col("parse_ok"), "processed").otherwise("skipped").as("status"))
      .agg(count(lit(1)).as("n_files"))
}
