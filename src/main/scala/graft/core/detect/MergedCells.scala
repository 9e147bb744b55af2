package graft.core.detect

import scala.collection.mutable
import graft.core.grid.{A1, CellGrid, Span}

/** A merged cell region (reference: detectors/merged_cell_analyzer.py:12-47).
  */
final case class MergedCell(
    startRow: Int,
    startCol: Int,
    endRow: Int,
    endCol: Int,
    value: String,
    var isHeader: Boolean = false,
    var spansColumns: Boolean = false,
    var spansRows: Boolean = false
) {
  def rowSpan: Int = endRow - startRow + 1
  def colSpan: Int = endCol - startCol + 1
  def area: Int = rowSpan * colSpan
  def contains(row: Int, col: Int): Boolean =
    startRow <= row && row <= endRow && startCol <= col && col <= endCol
}

/** Merged-cell analysis for header detection
  * (reference: detectors/merged_cell_analyzer.py:49-326).
  */
final class MergedCellAnalyzer {
  val headerRowThreshold = 10

  /** reference: merged_cell_analyzer.py:55-83. */
  def analyzeMergedCells(g: CellGrid, range: Option[Span]): Vector[MergedCell] = {
    val out = mutable.ArrayBuffer.empty[MergedCell]
    val processed = mutable.HashSet.empty[(Int, Int)]
    var r = 0
    while (r <= g.maxRow) {
      var c = 0
      while (c <= g.maxCol) {
        if (!processed.contains((r, c))) {
          val cell = g.get(r, c)
          if (cell != null && cell.isMerged && cell.mergeRange != null) {
            parseMergeRange(cell.mergeRange, cell.value).foreach { m =>
              val inRange = range.forall(tr =>
                m.startRow >= tr.r0 && m.endRow <= tr.r1 &&
                  m.startCol >= tr.c0 && m.endCol <= tr.c1)
              if (inRange) {
                out += m
                var rr = m.startRow
                while (rr <= m.endRow) {
                  var cc = m.startCol
                  while (cc <= m.endCol) { processed += ((rr, cc)); cc += 1 }
                  rr += 1
                }
              }
            }
          }
        }
        c += 1
      }
      r += 1
    }
    // analyze + sort (reference :76-83)
    out.foreach { m => analyzeMergedCell(m, g) }
    out.sortBy(m => (m.startRow, m.startCol)).toVector
  }

  /** reference: merged_cell_analyzer.py:166-224. */
  def parseMergeRange(range: String, value: String): Option[MergedCell] = {
    try {
      val parts = range.split(":")
      if (parts.length != 2) return None
      val (r0, c0) = A1.cellToIndices(parts(0).trim)
      val (r1, c1) = A1.cellToIndices(parts(1).trim)
      Some(MergedCell(r0, c0, r1, c1, if (value != null) value else "",
        spansColumns = c1 > c0, spansRows = r1 > r0))
    } catch { case _: Exception => None }
  }

  /** reference: merged_cell_analyzer.py:226-241. */
  private def analyzeMergedCell(m: MergedCell, g: CellGrid): Unit = {
    m.spansColumns = m.colSpan > 1
    m.spansRows = m.rowSpan > 1
    val first = g.get(m.startRow, m.startCol)
    if (first != null && (first.isBold || first.backgroundColor != null)) m.isHeader = true
  }

  /** reference: merged_cell_analyzer.py:85-108. */
  def findHeaderMergedCells(merged: Vector[MergedCell], maxHeaderRow: Int = headerRowThreshold)
      : Vector[MergedCell] = {
    merged.filter { m =>
      val likely = m.startRow < maxHeaderRow && isLikelyHeader(m)
      if (likely) m.isHeader = true
      likely
    }
  }

  /** reference: merged_cell_analyzer.py:243-260. */
  def isLikelyHeader(m: MergedCell): Boolean = {
    if (m.value == null || m.value.trim.isEmpty) false
    else if (m.spansColumns) true
    else m.startRow < 5 && m.spansRows
  }

  /** reference: merged_cell_analyzer.py:110-133. */
  def buildColumnSpans(merged: Vector[MergedCell]): Map[Int, Vector[(Int, Int)]] = {
    val byRow = mutable.HashMap.empty[Int, mutable.ArrayBuffer[(Int, Int)]]
    merged.foreach { m =>
      if (m.spansColumns) {
        (m.startRow to m.endRow).foreach { row =>
          byRow.getOrElseUpdate(row, mutable.ArrayBuffer.empty) += ((m.startCol, m.endCol))
        }
      }
    }
    byRow.map { case (row, spans) => row -> spans.sorted.toVector }.toMap
  }

  /** reference: merged_cell_analyzer.py:271-293. */
  def detectHierarchicalHeaders(merged: Vector[MergedCell]): Map[Int, Vector[MergedCell]] = {
    merged.filter(_.isHeader).groupBy(_.startRow)
      .map { case (row, cells) => row -> cells.sortBy(_.startCol).toVector }
  }

  /** reference: merged_cell_analyzer.py:295-326. */
  def getColumnHeaderMapping(merged: Vector[MergedCell], totalColumns: Int,
      tableStartCol: Int = 0): mutable.LinkedHashMap[Int, mutable.ArrayBuffer[String]] = {
    val mapping = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[String]]
    (0 until totalColumns).foreach(c => mapping(c) = mutable.ArrayBuffer.empty)
    val hierarchy = detectHierarchicalHeaders(merged)
    hierarchy.keys.toVector.sorted.foreach { row =>
      hierarchy(row).foreach { cell =>
        (cell.startCol to cell.endCol).foreach { col =>
          val tableCol = col - tableStartCol
          if (tableCol >= 0 && tableCol < totalColumns && cell.value.nonEmpty)
            mapping(tableCol) += cell.value
        }
      }
    }
    mapping
  }
}
