package graft.core.detect

import scala.collection.mutable
import graft.core.grid.{CellGrid, Span}

/** One cell of a multi-row header (reference: multi_header_detector.py:18-29).
  */
final case class HeaderCell(
    row: Int,
    col: Int,
    value: String,
    rowSpan: Int = 1,
    colSpan: Int = 1,
    isMerged: Boolean = false,
    isBold: Boolean = false
)

/** Multi-row header structure (reference: multi_header_detector.py:32-45). */
final case class MultiRowHeader(
    startRow: Int,
    endRow: Int,
    startCol: Int,
    endCol: Int,
    cells: Vector[HeaderCell],
    columnMappings: Map[Int, Vector[String]],
    confidence: Double
)

/** Multi-row header detection (reference: detectors/multi_header_detector.py).
  */
final class MultiHeaderDetector {
  val minHeaderRows = 1
  val maxHeaderRows = 10
  private val analyzer = new MergedCellAnalyzer

  final case class RowStats(numericCount: Int, nonEmptyCount: Int, boldCount: Int)

  /** reference: multi_header_detector.py:68-144. */
  def detectMultiRowHeaders(g: CellGrid, range: Span): Option[MultiRowHeader] = {
    require(range.rowCount > 0 && range.colCount > 0, "range must have positive dimensions")

    val merged = analyzer.analyzeMergedCells(g, Some(range))
    val headerMerged = analyzer.findHeaderMergedCells(merged, maxHeaderRows)
    val headerRowCount = estimateHeaderRows(g, range, headerMerged)
    if (headerRowCount <= 1) return None

    val headerCells = extractHeaderCells(g, headerRowCount, range, headerMerged)
    val columnMappings = analyzer.getColumnHeaderMapping(headerMerged, range.colCount, range.c0)
    enhanceColumnMappings(columnMappings, headerCells)
    analyzer.buildColumnSpans(headerMerged)
    val confidence = calculateConfidence(headerCells, columnMappings, headerMerged)

    Some(MultiRowHeader(
      startRow = range.r0,
      endRow = range.r0 + headerRowCount - 1,
      startCol = range.c0,
      endCol = range.c1,
      cells = headerCells,
      columnMappings = columnMappings.map { case (k, v) => k -> v.toVector }.toMap,
      confidence = confidence
    ))
  }

  /** reference: multi_header_detector.py:146-201. */
  def estimateHeaderRows(g: CellGrid, range: Span, headerMerged: Vector[MergedCell]): Int = {
    if (range.rowCount == 0) return 0
    val initial = calculateInitialHeaderRows(headerMerged, range)
    var rowOffset = initial
    val bound = math.min(maxHeaderRows, range.rowCount)
    while (rowOffset < bound) {
      val rowIdx = range.r0 + rowOffset
      val stats = analyzeRowStatistics(g, range, rowIdx)
      if (stats.nonEmptyCount == 0) {
        // skip empty rows
      } else if (isHeaderRow(stats)) {
        // still headers
      } else if (isDataRow(stats)) {
        return rowOffset
      } else if (rowOffset > 0 && hasFormatBoundary(g, range, rowIdx - 1, rowIdx)) {
        return rowOffset
      }
      rowOffset += 1
    }
    if (initial > 0) initial else 1
  }

  /** reference: multi_header_detector.py:190-201. */
  private def calculateInitialHeaderRows(headerMerged: Vector[MergedCell], range: Span): Int = {
    if (headerMerged.isEmpty) return 0
    var maxMergedRow = 0
    headerMerged.foreach { m =>
      maxMergedRow = math.max(maxMergedRow, m.endRow - range.r0)
    }
    math.min(maxMergedRow + 1, maxHeaderRows)
  }

  /** Row statistics A4 (reference: multi_header_detector.py:203-228). */
  def analyzeRowStatistics(g: CellGrid, range: Span, rowIdx: Int): RowStats = {
    var numeric = 0
    var nonEmpty = 0
    var bold = 0
    var c = range.c0
    while (c <= range.c1) {
      val cell = g.get(rowIdx, c)
      if (cell != null && !cell.valueIsNull) {
        nonEmpty += 1
        if (cell.dataType == "number") numeric += 1
        if (cell.isBold) bold += 1
      }
      c += 1
    }
    RowStats(numeric, nonEmpty, bold)
  }

  /** bold>50% ∧ numeric<20% (reference: multi_header_detector.py:230-238). */
  def isHeaderRow(s: RowStats): Boolean =
    s.nonEmptyCount > 0 &&
      s.boldCount.toDouble / s.nonEmptyCount > 0.5 &&
      s.numericCount.toDouble / s.nonEmptyCount < 0.2

  /** numeric>80% (reference: multi_header_detector.py:240-246). */
  def isDataRow(s: RowStats): Boolean =
    s.nonEmptyCount > 0 && s.numericCount.toDouble / s.nonEmptyCount > 0.8

  /** reference: multi_header_detector.py:248-323. */
  private def extractHeaderCells(g: CellGrid, headerRowCount: Int, range: Span,
      headerMerged: Vector[MergedCell]): Vector[HeaderCell] = {
    val cells = mutable.ArrayBuffer.empty[HeaderCell]
    val processed = mutable.HashSet.empty[(Int, Int)]

    headerMerged.foreach { m =>
      if (m.startRow < range.r0 + headerRowCount) {
        cells += HeaderCell(
          row = m.startRow - range.r0,
          col = m.startCol - range.c0,
          value = m.value,
          rowSpan = m.rowSpan,
          colSpan = m.colSpan,
          isMerged = true
        )
        var r = m.startRow
        while (r <= m.endRow) {
          if (r >= range.r0 && r < range.r0 + headerRowCount) {
            var c = m.startCol
            while (c <= m.endCol) { processed += ((r, c)); c += 1 }
          }
          r += 1
        }
      }
    }

    var rowOffset = 0
    while (rowOffset < headerRowCount) {
      val rowIdx = range.r0 + rowOffset
      var colOffset = 0
      while (colOffset < range.colCount) {
        val colIdx = range.c0 + colOffset
        if (!processed.contains((rowIdx, colIdx))) {
          val cd = g.get(rowIdx, colIdx)
          if (cd != null) {
            cells += HeaderCell(
              row = rowOffset,
              col = colOffset,
              value = if (cd.value != null) cd.value else "",
              isBold = cd.isBold
            )
          }
        }
        colOffset += 1
      }
      rowOffset += 1
    }
    cells.toVector
  }

  /** reference: multi_header_detector.py:338-358. */
  private def enhanceColumnMappings(
      mappings: mutable.LinkedHashMap[Int, mutable.ArrayBuffer[String]],
      headerCells: Vector[HeaderCell]): Unit = {
    headerCells.foreach { cell =>
      if (!cell.isMerged && cell.value.nonEmpty && cell.col < mappings.size) {
        val existing = mappings(cell.col)
        if (existing.size <= cell.row) {
          while (existing.size < cell.row) existing += ""
          existing += cell.value
        } else if (cell.row < existing.size && existing(cell.row).isEmpty) {
          existing(cell.row) = cell.value
        }
      }
    }
  }

  /** reference: multi_header_detector.py:360-387. */
  def hasFormatBoundary(g: CellGrid, range: Span, prevRow: Int, currRow: Int): Boolean = {
    var differences = 0
    var checked = 0
    var c = range.c0
    while (c <= range.c1) {
      val prev = g.get(prevRow, c)
      val curr = g.get(currRow, c)
      if (prev != null && curr != null) {
        checked += 1
        if (prev.isBold != curr.isBold) differences += 1
        if (prev.backgroundColor != curr.backgroundColor) differences += 1
      }
      c += 1
    }
    checked > 0 && differences > checked * 0.5
  }

  /** reference: multi_header_detector.py:389-425. */
  private def calculateConfidence(
      headerCells: Vector[HeaderCell],
      mappings: mutable.LinkedHashMap[Int, mutable.ArrayBuffer[String]],
      headerMerged: Vector[MergedCell]): Double = {
    val scores = mutable.ArrayBuffer.empty[Double]
    if (headerCells.nonEmpty) {
      val mergedRatio = headerMerged.size.toDouble / headerCells.size
      scores += math.min(mergedRatio * 2, 1.0)
    }
    val depths = mappings.values.filter(_.nonEmpty).map(_.size.toDouble).toVector
    if (depths.nonEmpty) {
      val avg = depths.sum / depths.size
      val variance =
        if (depths.size > 1) depths.map(d => (d - avg) * (d - avg)).sum / depths.size else 0.0
      val consistency = if (avg > 0) 1.0 - math.min(variance / avg, 1.0) else 0.0
      scores += consistency
    }
    if (headerCells.nonEmpty) {
      scores += headerCells.count(_.value.trim.nonEmpty).toDouble / headerCells.size
      scores += headerCells.count(_.isBold).toDouble / headerCells.size
    }
    if (scores.nonEmpty) scores.sum / scores.size else 0.0
  }
}
