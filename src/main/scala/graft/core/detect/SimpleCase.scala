package graft.core.detect

import graft.core.grid.{A1, CellGrid, Span}

/** Fast single-table detection (reference: detectors/simple_case_detector.py).
  */
final case class SimpleResult(
    isSimpleTable: Boolean,
    span: Option[Span],
    confidence: Double,
    hasHeaders: Boolean,
    reason: String
)

object SimpleCase {

  /** reference: simple_case_detector.py:43-117. */
  def detect(g: CellGrid): SimpleResult = {
    if (!g.hasData)
      return SimpleResult(isSimpleTable = false, None, 0.0, hasHeaders = true, "Sheet has no data")

    val (minRow, maxRow, minCol, maxCol) = findDataBounds(g)

    if (minRow > 2 || minCol > 2)
      return SimpleResult(isSimpleTable = false, None, 0.0, hasHeaders = true,
        "Data doesn't start near A1")

    // continuity: no empty rows / cols inside the bounds
    var r = minRow
    while (r <= maxRow) {
      if (!g.anyIn(r, r, minCol, maxCol))
        return SimpleResult(isSimpleTable = false, None, 0.0, hasHeaders = true,
          "Found empty rows within data region")
      r += 1
    }
    var c = minCol
    while (c <= maxCol) {
      if (!g.anyIn(minRow, maxRow, c, c))
        return SimpleResult(isSimpleTable = false, None, 0.0, hasHeaders = true,
          "Found empty columns within data region")
      c += 1
    }

    val totalCells = (maxRow - minRow + 1).toLong * (maxCol - minCol + 1)
    // reference counts cells with value is not None (includes blank strings
    // stored by the excel path); our grid stores only non-empty cells.
    val filled = g.countIn(minRow, maxRow, minCol, maxCol)
    val density = if (totalCells > 0) filled.toDouble / totalCells else 0.0

    if (density < 0.5)
      return SimpleResult(isSimpleTable = false, None, 0.0, hasHeaders = true, "Low data density")

    val hasHeaders = detectHeaders(g, minRow, minCol, maxCol)
    val confidence =
      calcConfidence(minRow, minCol, density, hasHeaders, maxRow - minRow + 1)

    SimpleResult(isSimpleTable = true, Some(Span(minRow, minCol, maxRow, maxCol)), confidence,
      hasHeaders, "Detected simple continuous table")
  }

  /** reference: simple_case_detector.py:119-175 (incl. dense-bounds shortcut
    * :145-156).
    */
  def findDataBounds(g: CellGrid): (Int, Int, Int, Int) = {
    if (!g.hasData) return (0, 0, 0, 0)
    if (g.presentAt(0, 0)) { // stored cells are never value-null
      val total = (g.maxRow + 1).toLong * (g.maxCol + 1)
      if (g.size.toDouble / total > 0.3) return (0, g.maxRow, 0, g.maxCol)
    }
    var minRow = Int.MaxValue
    var maxRow = -1
    var minCol = Int.MaxValue
    var maxCol = -1
    val cs = g.coordsSorted
    var i = 0
    while (i < cs.length) {
      val r = (cs(i) >> 32).toInt
      val c = cs(i).toInt
      if (r < minRow) minRow = r
      if (r > maxRow) maxRow = r
      if (c < minCol) minCol = c
      if (c > maxCol) maxCol = c
      i += 1
    }
    (minRow, maxRow, minCol, maxCol)
  }

  /** reference: simple_case_detector.py:322-381. */
  def detectHeaders(g: CellGrid, firstRow: Int, minCol: Int, maxCol: Int): Boolean = {
    val cur = g.cursor
    var any = false
    var allStrings = true
    var anyBold = false
    var c = minCol
    while (c <= maxCol) {
      if (cur.moveTo(firstRow, c)) {
        any = true
        if (cur.dataTypeCode != 1) allStrings = false
        if (cur.isBold) anyBold = true
      }
      c += 1
    }
    if (!any) return false

    var hasDifferentTypes = false
    if (firstRow + 1 <= g.maxRow) {
      var c2 = minCol
      while (c2 <= maxCol && !hasDifferentTypes) {
        if (cur.moveTo(firstRow + 1, c2) && cur.dataTypeCode != 1)
          hasDifferentTypes = true
        c2 += 1
      }
    }
    allStrings && (anyBold || hasDifferentTypes)
  }

  /** reference: simple_case_detector.py:383-447. */
  def calcConfidence(minRow: Int, minCol: Int, density: Double, hasHeaders: Boolean,
      rowCount: Int): Double = {
    var confidence = 0.5
    if (minRow == 0 && minCol == 0) confidence += 0.2
    else if (minRow <= 1 && minCol <= 1) confidence += 0.1
    if (density > 0.9) confidence += 0.2
    else if (density > 0.7) confidence += 0.1
    if (hasHeaders) confidence += 0.1
    if (rowCount < 3) confidence -= 0.1
    math.min(math.max(confidence, 0.0), 1.0)
  }

  /** Header projection with column-letter fallback
    * (reference: simple_case_detector.py:494-535).
    */
  def extractHeaders(g: CellGrid, span: Span): Vector[String] = {
    (span.c0 to span.c1).map { c =>
      val v = g.valueAt(span.r0, c) // non-null iff a (never value-null) cell exists
      if (v != null) v.trim else A1.colLetter(c)
    }.toVector
  }
}
