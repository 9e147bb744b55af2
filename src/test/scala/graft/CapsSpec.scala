package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.detect.DetectConfig
import graft.core.extract.Extractor
import graft.core.html.DelimitedText

/** The two hard safety caps (SURVEY §2 O3/O4) that no golden fixture
  * exceeds: the 1M-row delimited-parse cap (reference: csv_reader.py:252-255)
  * and the max-tables-per-sheet cap (reference config max_tables_per_sheet).
  */
class CapsSpec extends AnyFunSuite {

  test("O3: delimited parse stops at the 1M-row cap") {
    val rows = DelimitedText.MaxRows + 1000
    val sb = new java.lang.StringBuilder(rows * 4)
    var i = 0
    while (i < rows) { sb.append("a,1\n"); i += 1 }
    val (g, _) = DelimitedText.parse(sb.toString, ',')
    assert(g.maxRow + 1 <= DelimitedText.MaxRows + 1,
      s"grid has ${g.maxRow + 1} rows, cap is ${DelimitedText.MaxRows}")
    assert(g.maxRow + 1 >= DelimitedText.MaxRows, "cap must not truncate early")
  }

  test("O4: max_tables_per_sheet caps detected tables per region") {
    val fix = FixtureLoader.fixtures.find(_.name == "multi_table").get
    val html = s"<html><body>${FixtureLoader.renderHtml(fix)}</body></html>"
    val dflt = Extractor.extractHtml(html.getBytes("UTF-8"))
    assert(dflt.tables.size >= 2, s"fixture should yield >=2 tables, got ${dflt.tables.size}")
    val capped = Extractor.extractHtml(html.getBytes("UTF-8"),
      DetectConfig(maxTablesPerSheet = 1))
    assert(capped.tables.size == 1, s"cap=1 must keep one table, got ${capped.tables.size}")
  }

  test("GRAFT_EMPTY_ROW_TOLERANCE=0 splits the gap-bridged table (live knob e2e)") {
    // two 3x3 blocks separated by EXACTLY one empty row: tolerance 1
    // (default) bridges it into one island, tolerance 0 splits
    def block(v0: Int) =
      (0 until 3).map(r => "<tr>" + (0 until 3).map(c =>
        s"<td>w${v0 + r * 3 + c}</td>").mkString + "</tr>").mkString
    val html = "<html><body><table>" + block(1) +
      "<tr><td></td><td></td><td></td></tr>" + block(10) + "</table></body></html>"
    val bridged = Extractor.extractHtml(html.getBytes("UTF-8"))
    val cfg = DetectConfig.fromEnv(Map("GRAFT_EMPTY_ROW_TOLERANCE" -> "0").get)
    assert(cfg.emptyRowTolerance == 0)
    val split = Extractor.extractHtml(html.getBytes("UTF-8"), cfg)
    assert(split.tables.size > bridged.tables.size,
      s"tolerance 0 must split the 1-row gap: default=${bridged.tables.map(_.hit.span)} " +
        s"strict=${split.tables.map(_.hit.span)}")
  }

  test("GRAFT_USE_BORDER_DETECTION=false disables formatting-boundary splits (live knob e2e)") {
    val cfg = DetectConfig.fromEnv(Map("GRAFT_USE_BORDER_DETECTION" -> "false").get)
    assert(!cfg.useBorderDetection)
    // the knob must be live end-to-end: at least one golden fixture's
    // outcome changes when formatting-boundary detection is disabled
    val changed = FixtureLoader.fixtures.filter { fix =>
      val html = s"<html><body>${FixtureLoader.renderHtml(fix)}</body></html>"
      val on = Extractor.extractHtml(html.getBytes("UTF-8"))
      val off = Extractor.extractHtml(html.getBytes("UTF-8"), cfg)
      on.tables.map(t => (t.hit.span, t.hit.confidence, t.hit.method)) !=
        off.tables.map(t => (t.hit.span, t.hit.confidence, t.hit.method))
    }.map(_.name)
    assert(changed.nonEmpty,
      "disabling border detection changed no fixture outcome — knob is dead")
  }

  test("GRAFT_MAX_HTML_MB >= 2048 no longer overflows to a negative cap") {
    val cfg = DetectConfig.fromEnv(Map("GRAFT_MAX_HTML_MB" -> "4096").get)
    assert(cfg.maxHtmlBytes == Int.MaxValue, s"got ${cfg.maxHtmlBytes}")
    assert(cfg.maxHtmlBytes > 0, "a negative cap would mark every page parse_failed")
  }
}
