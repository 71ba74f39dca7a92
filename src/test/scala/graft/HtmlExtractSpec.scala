package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HtmlExtract

/** Block-level boilerplate removal: planted keep/drop decisions per
  * rule, entity escaping, degenerate pages, and the zero-shuffle plan
  * contract. */
class HtmlExtractSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def extractOne(html: String) = {
    val out = HtmlExtract.extract(
      Seq((1L, html)).toDF("id", "html"), "id", "html").collect().head
    (out.getAs[String]("title"), out.getAs[Long]("n_blocks"),
      out.getAs[Long]("n_kept"), out.getAs[String]("extracted_text"),
      out.getAs[Long]("content_chars"), out.getAs[Long]("boiler_chars"))
  }

  private val longText =
    "this block carries enough plain prose characters to clear the " +
      "minimum content length rule easily"

  test("content kept; nav, ads, short stubs and link-heavy footers dropped") {
    val html = "<html><head><title>T</title></head><body>" +
      "<nav><a href=\"/\">Home</a><a href=\"/x\">Other</a></nav>" +
      s"<div class=\"main\">$longText</div>" +
      "<div class=\"stub\">too short</div>" +
      "<div class=\"ads\"><a href=\"/b\">Buy this now</a>" +
      "<a href=\"/w\">Win a big prize today</a> !</div>" +
      "<footer>(c) <a href=\"/p\">Privacy policy page</a>" +
      "<a href=\"/t\">Terms of use page</a></footer></body></html>"
    val (title, nBlocks, nKept, text, cChars, bChars) = extractOne(html)
    assert(title == "T")
    assert(nBlocks == 5)
    assert(nKept == 1)
    assert(text == longText)
    assert(cChars == longText.length)
    assert(bChars > 0)
  }

  test("link density boundary: exactly 1/3 kept, just over dropped") {
    // 50 text chars of which 16 are link text: 16*3 = 48 <= 50 → kept
    val pad34 = "x" * 34
    val kept = s"<div>$pad34<a href=\"/l\">${"y" * 16}</a></div>"
    // 17 of 51: 17*3 = 51 <= 51 → still kept (boundary inclusive)
    val boundary = s"<div>$pad34<a href=\"/l\">${"y" * 17}</a></div>"
    // 18 of 52: 18*3 = 54 > 52 → dropped
    val over = s"<div>$pad34<a href=\"/l\">${"y" * 18}</a></div>"
    assert(extractOne(s"<html><body>$kept</body></html>")._3 == 1)
    assert(extractOne(s"<html><body>$boundary</body></html>")._3 == 1)
    assert(extractOne(s"<html><body>$over</body></html>")._3 == 0)
  }

  test("min-length boundary: 25 chars kept, 24 dropped") {
    assert(extractOne(s"<html><body><div>${"a" * 25}</div></body></html>")._3 == 1)
    assert(extractOne(s"<html><body><div>${"a" * 24}</div></body></html>")._3 == 0)
  }

  test("degenerate pages: no blocks, no title") {
    val (title, nBlocks, nKept, text, cChars, bChars) =
      extractOne("<p>free text outside any block element</p>")
    assert(title == "" && nBlocks == 0 && nKept == 0 && text == "" &&
      cChars == 0 && bChars == 0)
  }

  test("renderHtml escapes markup-significant characters in doc text") {
    val rendered = Seq((7L, "comparison facts: a < b & c > d, worth keeping in prose"))
      .toDF("doc_id", "text")
      .select(HtmlExtract.renderHtml(col("doc_id"), col("text")).as("html"))
      .collect().head.getString(0)
    assert(rendered.contains("a &lt; b &amp; c &gt; d"))
    // escaped text cannot open a tag, so the strip pass returns it
    val out = HtmlExtract.extract(
      Seq((7L, rendered)).toDF("id", "html"), "id", "html")
      .collect().head.getAs[String]("extracted_text")
    assert(out.contains("a &lt; b &amp; c &gt; d"))
  }

  test("plan contract: extraction is one narrow pass — no shuffle") {
    val df = HtmlExtract.extract(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"),
          HtmlExtract.renderHtml(col("doc_id"), col("text")).as("html")),
      "doc_id", "html")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
