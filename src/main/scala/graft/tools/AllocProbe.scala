package graft.tools

import graft.core.detect.{BoxTable, Cascade, DetectConfig, IslandDetector, SimpleCase}
import graft.spark.PageGen

/** One-off allocation probe for the island-detect hot path. */
object AllocProbe {
  def main(args: Array[String]): Unit = {
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val docs = (0 until 20000 by 10).map { b =>
      PageGen.makePage(b + 2L, "The quick brown fox jumps over the lazy dog. " * 8, "en").html
    }.toArray
    val parsed = docs.map(d => graft.core.html.PageParser.parseBytes(d))
    val grids = parsed.flatMap(_.regions).map(_.grid)
    println(s"grids=${grids.length}")

    def measure(label: String)(f: => Unit): Unit = {
      f // warm
      val a0 = tmx.getThreadAllocatedBytes(tid)
      f
      println(f"ALLOC $label%-28s ${(tmx.getThreadAllocatedBytes(tid) - a0) / grids.length}%8d B/grid")
    }

    val cfg = DetectConfig()
    measure("cascade full") { grids.foreach(g => Cascade.detect(g, graft.core.detect.GridKind.Formatted, cfg)) }
    val det = new IslandDetector()
    measure("detectIslands only") { grids.foreach(det.detectIslands) }
    val detNoFmt = new IslandDetector(useFormattingBoundaries = false)
    measure("no formatting splits") { grids.foreach(detNoFmt.detectIslands) }
    val detNoGap = new IslandDetector(useFormattingBoundaries = false, emptyRowTolerance = 0)
    measure("no fmt, no reconnect") { grids.foreach(detNoGap.detectIslands) }
    measure("simplecase only") { grids.foreach(g => SimpleCase.detect(g)) }
    val box = new BoxTable(cfg.minTableRows, cfg.minTableCols)
    measure("boxtable only") { grids.foreach(g => box.detect(g)) }
    measure("islands+toTableHits") { grids.foreach { g =>
      val is = det.detectIslands(g).filter(_.confidence >= cfg.confidenceThreshold)
      det.toTableHits(is, cfg.confidenceThreshold, g)
    } }
    val detCascade = new IslandDetector(
      maxGap = graft.core.detect.IslandConst.ExcelFileMaxGap,
      adaptiveThresholds = cfg.adaptiveThresholds,
      emptyRowTolerance = cfg.emptyRowTolerance,
      useFormattingBoundaries = cfg.useBorderDetection)
    measure("cascade-cfg islands+hits") { grids.foreach { g =>
      val is = detCascade.detectIslands(g).filter(_.confidence >= cfg.confidenceThreshold)
      detCascade.toTableHits(is, cfg.confidenceThreshold, g)
    } }
    val hist = grids.map(g => Cascade.detect(g, graft.core.detect.GridKind.Formatted, cfg).methodUsed)
      .groupBy(identity).view.mapValues(_.length).toMap
    println(s"cascade methods: $hist")
    measure("cascade full (rerun)") { grids.foreach(g => Cascade.detect(g, graft.core.detect.GridKind.Formatted, cfg)) }
    measure("manual replica") { grids.foreach { g =>
      SimpleCase.detect(g)
      new BoxTable(cfg.minTableRows, cfg.minTableCols).detect(g)
      val d = new IslandDetector(
        maxGap = graft.core.detect.IslandConst.ExcelFileMaxGap,
        adaptiveThresholds = cfg.adaptiveThresholds,
        emptyRowTolerance = cfg.emptyRowTolerance,
        useFormattingBoundaries = cfg.useBorderDetection)
      val is = d.detectIslands(g).filter(_.confidence >= cfg.confidenceThreshold)
      var ts = d.toTableHits(is, cfg.confidenceThreshold, g)
      val minCells = (g.size * cfg.minTablePercentage).toInt
      ts = ts.filter(t => Cascade.tableCellCount(t.span, g) >= minCells)
      if (ts.size > 1) ts = ts.sortBy(t => -Cascade.tableCellCount(t.span, g))
    } }

    // extract-tables path: detection + TableExtractor per span
    val cfgX = DetectConfig(extractTables = true)
    val docsAll = (0 until 20000 by 2).map { b =>
      PageGen.makePage(b.toLong, "The quick brown fox jumps over the lazy dog. " * 8, "en").html
    }.toArray
    def measureDocs(label: String)(f: => Unit): Unit = {
      f
      val a0 = tmx.getThreadAllocatedBytes(tid)
      f
      println(f"ALLOC $label%-28s ${(tmx.getThreadAllocatedBytes(tid) - a0) / docsAll.length}%8d B/doc")
    }
    measureDocs("extract (tables OFF)") {
      docsAll.foreach(d => graft.core.extract.Extractor.extractHtml(d))
    }
    measureDocs("extract (tables ON)") {
      docsAll.foreach(d => graft.core.extract.Extractor.extractHtml(d, cfgX))
    }

    // TableExtractor in isolation over dense grids (variant 1)
    val denseGrids = (0 until 20000 by 10).map { b =>
      graft.core.html.PageParser.parseBytes(
        PageGen.makePage(b + 1L, "The quick brown fox jumps over the lazy dog. " * 8, "en").html)
        .regions.head.grid
    }.toArray
    def measureGrids(label: String)(f: => Unit): Unit = {
      f
      val a0 = tmx.getThreadAllocatedBytes(tid)
      f
      println(f"ALLOC $label%-28s ${(tmx.getThreadAllocatedBytes(tid) - a0) / denseGrids.length}%8d B/grid")
    }
    measureGrids("tableextract dense full") {
      denseGrids.foreach { g =>
        val span = graft.core.grid.Span(0, 0, g.maxRow, g.maxCol)
        new graft.core.extract.TableExtractor().extract(g, span)
      }
    }
    measureGrids("tableextract no headers") {
      denseGrids.foreach { g =>
        val span = graft.core.grid.Span(0, 0, g.maxRow, g.maxCol)
        new graft.core.extract.TableExtractor().extract(g, span, detectHeaders = false)
      }
    }
    measureGrids("headerinfo only") {
      denseGrids.foreach { g =>
        val te = new graft.core.extract.TableExtractor()
        te.detectHeaderInfo(new graft.core.extract.SpanStats(
          g, 0, 0, g.maxRow + 1, g.maxCol + 1))
      }
    }
    measureGrids("extractStats (kernel path)") {
      denseGrids.foreach { g =>
        val span = graft.core.grid.Span(0, 0, g.maxRow, g.maxCol)
        new graft.core.extract.TableExtractor().extractStats(g, span)
      }
    }
  }
}
