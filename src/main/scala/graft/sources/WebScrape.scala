package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Web-scrape content extraction (reference S8).
  *
  * The reference fetches a URL, strips script/style/nav-like nodes by an
  * id/class/role blocklist, groups the remainder into sections by
  * `<section>/<article>` tags or heading hierarchy, and writes slugified
  * per-section text files (reference: src/server/app/embed/webscrape.py:
  * 44-143, blocklist :17-41).
  *
  * Here the fetch is out of scope (no egress); the extraction is the Spark
  * operator: a deterministic regex-based `html → array<struct<title,
  * content>>` transform applied per row and exploded — the UDF-chain shape
  * SURVEY.md §2.1 prescribes. Parsing is intentionally heuristic (no HTML
  * parser dependency in the runtime); its contract is pinned by unit tests.
  */
object WebScrape {

  private val blockTags = Seq("script", "style", "noscript", "nav", "header", "footer")

  /** Strip blocked elements and tags, yielding (title, content) sections
    * split on h1/h2/h3 headings — pure function, testable off-Spark. */
  def extractSections(html: String): Seq[(String, String)] = {
    if (html == null) return Seq.empty
    var cleaned = html
    blockTags.foreach { t =>
      cleaned = cleaned.replaceAll(s"(?is)<$t\\b[^>]*>.*?</$t>", " ")
    }
    // sections on headings; leading content before the first heading → "" title
    val parts = cleaned.split("(?i)(?=<h[1-3][^>]*>)")
    parts.toSeq.flatMap { part =>
      val titleMatch = "(?is)<h[1-3][^>]*>(.*?)</h[1-3]>".r.findFirstMatchIn(part)
      val title = titleMatch.map(m => stripTags(m.group(1))).getOrElse("")
      val body = titleMatch.map(m => part.substring(m.end)).getOrElse(part)
      val content = stripTags(body)
      if (content.nonEmpty) Some(title -> content) else None
    }
  }

  private def stripTags(s: String): String =
    java.text.Normalizer.normalize(
        s.replaceAll("(?s)<[^>]*>", " "), java.text.Normalizer.Form.NFKC)
      .replaceAll("&amp;", "&").replaceAll("&lt;", "<").replaceAll("&gt;", ">")
      .replaceAll("&nbsp;", " ")
      .replaceAll("\\s+", " ").trim // P6 whitespace/unicode normalize

  /** Distributed form: explode each page's HTML column into
    * (section_index, title, content) rows. */
  def sections(df: DataFrame, htmlCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("section_index", IntegerType, nullable = false),
      StructField("title", StringType),
      StructField("content", StringType)))
    val idx = df.schema.fieldIndex(htmlCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        extractSections(r.getString(idx)).zipWithIndex.map { case ((t, c), i) =>
          Row.fromSeq(r.toSeq ++ Seq(i, t, c))
        }
      }
    }(enc)
  }
}
