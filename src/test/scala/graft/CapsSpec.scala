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
}
