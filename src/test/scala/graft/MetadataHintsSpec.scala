package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.detect.MetadataHints
import graft.core.extract.Extractor
import graft.core.html.PageParser

/** The ExcelMetadataExtractor analogue (reference:
  * detectors/excel_metadata_extractor.py:292-344): author-declared table
  * metadata from markup, same three-tier confidence ladder, and the
  * invariant that metadata never leaks into the canonical text.
  */
class MetadataHintsSpec extends AnyFunSuite {

  private val table =
    """<table id="q3-results" class="data-table wide" summary="quarterly sales by region">
      |<caption>Q3 Sales</caption>
      |<tr><th>Region</th><th>Sales</th></tr>
      |<tr><td>North</td><td>100</td></tr>
      |<tr><td>South</td><td>200</td></tr>
      |</table>""".stripMargin

  test("caption, summary and semantic class become hints at the reference confidences") {
    val page = PageParser.parse(s"<html><body>$table</body></html>")
    assert(page.regions.size == 1)
    val hints = MetadataHints.hints(page.regions.head.meta)
    assert(hints.map(h => (h.source, h.confidence)).toSet ==
      Set(("caption", 0.95), ("summary", 0.7), ("semantic_class", 0.5)))
    assert(hints.find(_.source == "caption").get.name == "Q3 Sales")
    assert(hints.find(_.source == "summary").get.name == "quarterly sales by region")
    val sem = hints.find(_.source == "semantic_class").get.name
    assert(sem.contains("data") && sem.contains("table") && sem.contains("results"))
  }

  test("non-semantic classes and missing metadata yield no hints") {
    val page = PageParser.parse(
      "<html><body><table class=\"navbar main-nav\"><tr><th>A</th><th>B</th></tr>" +
        "<tr><td>1</td><td>2</td></tr></table></body></html>")
    assert(MetadataHints.hints(page.regions.head.meta).isEmpty)
  }

  test("captions are metadata, never canonical text") {
    val bare = table.replaceAll("<caption>.*</caption>", "")
      .replaceAll(""" id="[^"]*"| class="[^"]*"| summary="[^"]*"""", "")
    val withMeta = Extractor.extractHtml(
      s"<html><body><p>some surrounding prose here</p>$table</body></html>".getBytes("UTF-8"))
    val without = Extractor.extractHtml(
      s"<html><body><p>some surrounding prose here</p>$bare</body></html>".getBytes("UTF-8"))
    assert(withMeta.text == without.text,
      "caption/summary/class must not change the byte-identity contract")
    assert(withMeta.sha256 == without.sha256)
    assert(withMeta.hints.nonEmpty && without.hints.isEmpty)
  }

  test("hints ride through the Spark pipeline") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val page = graft.spark.Page("u:hints", new java.sql.Timestamp(0),
      s"<html><body>$table</body></html>".getBytes("UTF-8"), "", "en")
    val out = graft.spark.Pipeline.extract(spark, Seq(page).toDS()).collect()(0)
    assert(out.hints.map(_.source).toSet == Set("caption", "summary", "semantic_class"))
    assert(out.hints.forall(_.region == 0))
  }
}
