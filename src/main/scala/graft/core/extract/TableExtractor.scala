package graft.core.extract

import scala.collection.mutable
import graft.core.grid.{Cell, CellGrid, GridCursor, Span, TypeInfer}

final case class TableData(columns: Vector[String], rows: Vector[Vector[String]]) {
  def rowCount: Int = rows.size
  def colCount: Int = columns.size
}

/** Header detection result
  * (reference: extractors/dataframe_extractor.py:15-37).
  */
final case class HeaderResult(
    hasHeaders: Boolean,
    headerRows: Int,
    headerColumns: Int,
    orientation: String, // vertical | horizontal
    headers: Vector[String],
    confidence: Double,
    titleRows: Vector[Int] = Vector.empty,
    dataSampleSize: Int = 0,
    columnTypes: Map[Int, String] = Map.empty,
    tableType: String = "standard", // standard | plate_map
    plateFormat: Option[Int] = None
)

/** Cursor-backed span view (round 6; replaced the Array[Array[Cell]]
  * matrix): presence is one eager boolean per cell and the extractor type
  * a lazily-memoized byte — detection reads attributes, blankness, type
  * classes and numeric tests through [[GridCursor]] and the charwise
  * TypeInfer predicates, so the scoring passes materialize NO Cell objects
  * and NO value Strings (the old `g.get`-built matrix allocated a cached
  * Cell per present cell plus value/trim copies for every classified
  * cell). The few genuinely value-consuming stages — distinct-value
  * ratios, header text extraction, plate row labels via their own span
  * walk — read lazily through [[cellAt]]/[[value]], which is also where
  * [[TableExtractor.extract]]'s TableData rows come from, so the two paths
  * share one view and cannot drift.
  *
  * Grids never store empty cells (CellGrid.put/putSpanned skip them), so
  * `present` ⇔ the old `get != null && !isEmpty` matrix slot.
  */
private[graft] final class SpanStats(val g: CellGrid, val r0: Int, val c0: Int,
    val rows: Int, val cols: Int) {
  private val cur: GridCursor = g.cursor
  private val present_ = new Array[Boolean](rows * cols)
  private val etype = new Array[Byte](rows * cols) // 0 = uncomputed, else code+1
  locally {
    var r = 0
    while (r < rows) {
      val base = r * cols
      var c = 0
      while (c < cols) {
        present_(base + c) = cur.moveTo(r0 + r, c0 + c)
        c += 1
      }
      r += 1
    }
  }

  @inline def present(r: Int, c: Int): Boolean = present_(r * cols + c)

  /** `value.exists(_ > ' ')` of a present cell (callers check presence). */
  def nonBlank(r: Int, c: Int): Boolean =
    present_(r * cols + c) && { cur.moveTo(r0 + r, c0 + c); cur.valueNonBlank }

  /** TypeInfer.extractorType as a code (EtEmpty for absent cells),
    * memoized per cell — candidate header windows overlap heavily.
    */
  def etypeCode(r: Int, c: Int): Int = {
    val i = r * cols + c
    if (!present_(i)) return TypeInfer.EtEmpty
    val m = etype(i)
    if (m != 0) m - 1
    else {
      cur.moveTo(r0 + r, c0 + c)
      val code = TypeInfer.extractorTypeCode(cur)
      etype(i) = (code + 1).toByte
      code
    }
  }

  /** Cell.dataTypeCode of a present cell. */
  def dataTypeCode(r: Int, c: Int): Int = {
    cur.moveTo(r0 + r, c0 + c)
    cur.dataTypeCode
  }

  /** PlainFloatRe over value.trim of a present cell, charwise. */
  def plainFloat(r: Int, c: Int): Boolean = {
    cur.moveTo(r0 + r, c0 + c)
    TypeInfer.cursorPlainFloat(cur)
  }

  /** Materialized value of a present cell (the rare value-consuming
    * stages; cached on the grid's object slot).
    */
  def value(r: Int, c: Int): String = g.get(r0 + r, c0 + c).value

  /** The Cell object at a span-relative position, or null. */
  def cellAt(r: Int, c: Int): Cell = g.get(r0 + r, c0 + c)

  private val cur2: GridCursor = g.cursor

  /** Char-exact equality of the values at two PRESENT positions (the
    * String-equality a HashSet[String] would compute) — two cursors, zero
    * materialization. Lets narrow-row distinct counts run as O(n²) span
    * compares instead of building a string set per row.
    */
  def valuesEqual(r1: Int, c1: Int, r2: Int, c2: Int): Boolean = {
    cur.moveTo(r0 + r1, c0 + c1)
    cur2.moveTo(r0 + r2, c0 + c2)
    val a = cur.valueCs
    val af = cur.valueCsFrom
    val n = cur.valueCsUntil - af
    val b = cur2.valueCs
    val bf = cur2.valueCsFrom
    if (cur2.valueCsUntil - bf != n) return false
    var i = 0
    while (i < n) {
      if (a.charAt(af + i) != b.charAt(bf + i)) return false
      i += 1
    }
    true
  }

  /** The horizontal path's numeric-like test (digits/'.'/'-' with ≥1
    * digit) over the col-0 value chars of a PRESENT row — the charwise
    * `isAllDigits(h.replace(".","").replace("-",""))`.
    */
  def headerNumericLike(r: Int): Boolean = {
    cur.moveTo(r0 + r, c0)
    val cs = cur.valueCs
    var i = cur.valueCsFrom
    val n = cur.valueCsUntil
    var digits = 0
    while (i < n) {
      val ch = cs.charAt(i)
      if (ch >= '0' && ch <= '9') digits += 1
      else if (ch != '.' && ch != '-') return false
      i += 1
    }
    digits > 0
  }

  /** Col-0 value of PRESENT row `r` equals the literal placeholder
    * "Col_<idx>" (the collision case between a real value and an absent
    * row's synthetic header).
    */
  def headerEqualsPlaceholder(r: Int, idx: Int): Boolean = {
    cur.moveTo(r0 + r, c0)
    val cs = cur.valueCs
    val f = cur.valueCsFrom
    val u = cur.valueCsUntil
    if (u - f < 5) return false // "Col_" + at least one digit
    if (cs.charAt(f) != 'C' || cs.charAt(f + 1) != 'o' ||
        cs.charAt(f + 2) != 'l' || cs.charAt(f + 3) != '_') return false
    val s = java.lang.Integer.toString(idx)
    if (u - f - 4 != s.length) return false
    var i = 0
    while (i < s.length) {
      if (cs.charAt(f + 4 + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }
}

/** Port of the reference's DataFrame extraction with intelligent header
  * detection (reference: extractors/dataframe_extractor.py:39-914): density
  * gate, plate-map detection, enhanced vertical header scoring
  * (0.5·type-consistency + 0.3·header-quality + 0.2·coverage), horizontal
  * (transposed) detection, title-row skipping, multi-row merged-aware
  * header extraction, and the 4-component quality score.
  */
object TableExtractor {
  // module-level (one allocation per JVM): a TableExtractor is
  // constructed per extracted span, so instance constants would be
  // rebuilt per table
  private val PlateFormats: Seq[(Int, Seq[(Int, Int)])] = Seq(
    6 -> Seq((2, 3), (3, 2)),
    24 -> Seq((4, 6), (6, 4)),
    96 -> Seq((8, 12), (12, 8)),
    384 -> Seq((16, 24), (24, 16)),
    1536 -> Seq((32, 48), (48, 32))
  )
}

final class TableExtractor(minDataRows: Int = 2, minDataDensity: Double = 0.3) {
  import TableExtractor.PlateFormats

  /** The cursor-backed span view (see [[SpanStats]]); None iff the span is
    * degenerate. Shared by [[extract]] and [[extractStats]] so the two
    * paths cannot drift.
    */
  private def spanStats(g: CellGrid, span: Span): Option[SpanStats] = {
    val nRows = span.r1 - span.r0 + 1
    val nCols = span.c1 - span.c0 + 1
    if (nRows <= 0 || nCols <= 0) None
    else Some(new SpanStats(g, span.r0, span.c0, nRows, nCols))
  }

  /** reference: dataframe_extractor.py:52-116. */
  def extract(g: CellGrid, span: Span, detectHeaders: Boolean = true)
      : (Option[TableData], Option[HeaderResult], Double) = {
    val st = spanStats(g, span) match {
      case None => return (None, None, 0.0)
      case Some(s) => s
    }
    val density = calcDensity(st)
    if (density < minDataDensity) return (None, None, 0.0)

    val headerInfo = if (detectHeaders) Some(detectHeaderInfo(st)) else None
    val table = createTable(st, headerInfo)
    table match {
      case None => (None, headerInfo, 0.0)
      case Some(t) if t.rowCount < minDataRows =>
        if (headerInfo.exists(_.tableType == "plate_map")) (table, headerInfo, 0.95)
        else (None, headerInfo, 0.0)
      case Some(t) =>
        (table, headerInfo, qualityScore(t, headerInfo, density))
    }
  }

  /** reference: dataframe_extractor.py:157-183. */
  private def calcDensity(st: SpanStats): Double = {
    val total = st.rows.toLong * st.cols
    if (total == 0) return 0.0
    var nonEmpty = 0L
    var r = 0
    while (r < st.rows) {
      var c = 0
      while (c < st.cols) { if (st.present(r, c)) nonEmpty += 1; c += 1 }
      r += 1
    }
    nonEmpty.toDouble / total
  }

  /** reference: dataframe_extractor.py:185-240. The horizontal candidate
    * is SCORED without materializing its header vector (charwise distinct
    * + text-ness over the col-0 spans); the vector is built only when the
    * horizontal orientation actually wins — on most grids vertical wins
    * and the old per-grid col-0 value materialization was pure waste.
    */
  private[graft] def detectHeaderInfo(st: SpanStats): HeaderResult = {
    detectPlateFormat(st).getOrElse {
      val vertical = detectVerticalEnhanced(st)
      val (hScore, hCols) = detectHorizontalScore(st)
      if (vertical.confidence > hScore) vertical
      else {
        // bestHeaders semantics preserved: non-empty iff some candidate
        // scored above the initial 0.0
        val headers = if (hScore > 0.0) horizontalHeaderVector(st) else Vector.empty
        HeaderResult(hasHeaders = hScore > 0.5, 0, hCols, "horizontal", headers, hScore)
      }
    }
  }

  // ---- plate maps (reference: dataframe_extractor.py:516-614) ----

  private def detectPlateFormat(st: SpanStats): Option[HeaderResult] = {
    if (st.rows < 3) return None
    var bestScore = 0
    var best: Option[(Int, Int)] = None
    PlateFormats.foreach { case (wells, dims) =>
      dims.foreach { case (rows, cols) =>
        if (st.rows >= rows + 1 && st.cols >= cols + 1 &&
            checkPlateRowLabels(st, rows) && checkPlateColLabels(st, cols)) {
          val rowDiff = math.abs(st.rows - (rows + 1))
          val colDiff = math.abs(st.cols - (cols + 1))
          val score = 1000 - (rowDiff + colDiff)
          if (score > bestScore) {
            bestScore = score
            best = Some((wells, cols))
          }
        }
      }
    }
    best.map { case (wells, cols) =>
      HeaderResult(
        hasHeaders = true,
        headerRows = 1,
        headerColumns = 0,
        orientation = "vertical",
        headers = "Well" +: (1 to cols).map(_.toString).toVector,
        confidence = 0.95,
        tableType = "plate_map",
        plateFormat = Some(wells)
      )
    }
  }

  /** reference: dataframe_extractor.py:585-597 — exact A..H match. The
    * present labels, in order, must equal exactly A..<expected>; compared
    * with a trim-bounds walk over the backing span (labels are single
    * letters, so per-char case folding is exact).
    */
  private def checkPlateRowLabels(st: SpanStats, expectedRows: Int): Boolean = {
    if (st.rows < expectedRows + 1) return false
    var k = 0
    var i = 1
    val until = math.min(expectedRows + 1, st.rows)
    while (i < until) {
      val c = if (st.cols > 0 && st.present(i, 0)) st.cellAt(i, 0) else null
      if (c != null && !c.valueIsNull) {
        if (k >= expectedRows) return false // more labels than expected
        val cs = c.valueCs
        var a = c.valueCsFrom
        var b = c.valueCsUntil
        while (a < b && Character.isWhitespace(cs.charAt(a))) a += 1
        while (b > a && Character.isWhitespace(cs.charAt(b - 1))) b -= 1
        if (b - a != 1) return false
        if (Character.toUpperCase(cs.charAt(a)) != ('A' + k).toChar) return false
        k += 1
      }
      i += 1
    }
    k == expectedRows
  }

  /** reference: dataframe_extractor.py:599-614. */
  private def checkPlateColLabels(st: SpanStats, expectedCols: Int): Boolean = {
    if (st.cols < expectedCols + 1) return false
    (1 until math.min(expectedCols + 1, st.cols)).forall { i =>
      st.present(0, i) && cellParsesToInt(st.cellAt(0, i), i)
    }
  }

  /** `Integer.parseInt(c.value.trim) == want` (false on the
    * NumberFormatException) replayed over the backing span — no value/trim
    * Strings. parseInt semantics kept exactly: one optional leading sign,
    * then Character.digit(_, 10) digits (Unicode digits included), nothing
    * else; overflow can never equal a plate column index.
    */
  private def cellParsesToInt(c: Cell, want: Int): Boolean = {
    val cs = c.valueCs
    if (cs == null) return false
    var a = c.valueCsFrom
    var b = c.valueCsUntil
    while (a < b && cs.charAt(a) <= ' ') a += 1
    while (b > a && cs.charAt(b - 1) <= ' ') b -= 1
    if (a >= b) return false
    var i = a
    var neg = false
    val ch0 = cs.charAt(i)
    if (ch0 == '+' || ch0 == '-') { neg = ch0 == '-'; i += 1 }
    if (i >= b) return false
    var v = 0L
    while (i < b) {
      val d = Character.digit(cs.charAt(i), 10)
      if (d < 0) return false
      v = v * 10 + d
      if (v > 1000000L) return false // far past any plate index; parseInt
        // overflow throws -> false, so capping early is verdict-identical
      i += 1
    }
    (if (neg) -v else v) == want
  }

  // ---- vertical (reference: dataframe_extractor.py:627-720) ----

  /** Title rows have ≤2 filled cells of >3 (dataframe_extractor.py:616-625).
    */
  private def isTitleRow(st: SpanStats, r: Int): Boolean = {
    var filled = 0
    var i = 0
    while (i < st.cols) {
      if (st.nonBlank(r, i)) filled += 1
      i += 1
    }
    filled <= 2 && st.cols > 3
  }

  private def detectVerticalEnhanced(st: SpanStats): HeaderResult = {
    if (st.rows < 2)
      return HeaderResult(hasHeaders = false, 0, 0, "vertical", Vector.empty, 0.0)

    var bestScore = 0.0
    var bestStart = 0
    var bestEnd = 0
    val titleRows = mutable.ArrayBuffer.empty[Int]
    val typeScoreCache = new java.util.HashMap[Int, java.lang.Double]()

    // per-row header-quality terms, computed once (candidate windows
    // overlap): the text/filled ratio and the row's distinct-value ratio —
    // same values and summation order as the reference's multi-row header
    // quality (dataframe_extractor.py:821-853) over a slice. The distinct
    // ratio is the one stage here that must read value Strings.
    val qRows = math.min(st.rows, 13) // startRow < 10, headerRows <= 3
    val rowRatio = new Array[Double](qRows)
    val rowHasFilled = new Array[Boolean](qRows)
    val lastRatio = new Array[Double](qRows)
    val lastNonEmpty = new Array[Boolean](qRows)
    // distinct-value counting: narrow rows (the overwhelming case) run
    // O(n²) span compares through the cursors — the String-set verdict
    // with zero value materialization; wide rows fall back to the set
    // (quadratic compares would beat the string cost there)
    val narrow = st.cols <= 64
    val seenCols = if (narrow) new Array[Int](st.cols) else null
    val distinctVals = if (narrow) null else new java.util.HashSet[String]()
    var qi = 0
    while (qi < qRows) {
      var textCount = 0
      var filled = 0
      var distinct = 0
      if (!narrow) distinctVals.clear()
      var nSeen = 0
      var ci = 0
      while (ci < st.cols) {
        if (st.nonBlank(qi, ci)) {
          filled += 1
          if (st.etypeCode(qi, ci) == TypeInfer.EtText) textCount += 1
          if (narrow) {
            var dup = false
            var s = 0
            while (s < nSeen && !dup) {
              if (st.valuesEqual(qi, ci, qi, seenCols(s))) dup = true
              s += 1
            }
            if (!dup) distinct += 1
            seenCols(nSeen) = ci
            nSeen += 1
          } else if (distinctVals.add(st.value(qi, ci))) distinct += 1
        }
        ci += 1
      }
      rowHasFilled(qi) = filled > 0
      if (filled > 0) rowRatio(qi) = textCount.toDouble / filled
      lastNonEmpty(qi) = filled > 0
      if (filled > 0) lastRatio(qi) = distinct.toDouble / filled
      qi += 1
    }
    def headerQualityCached(from: Int, until: Int): Double = {
      var sum = 0.0
      var n = 0
      var r = from
      while (r < until) {
        if (rowHasFilled(r)) { sum += rowRatio(r); n += 1 }
        r += 1
      }
      if (lastNonEmpty(until - 1)) { sum += lastRatio(until - 1); n += 1 }
      if (n > 0) sum / n else 0.0
    }

    val maxTestRows = math.min(10, st.rows - 2)
    var startRow = 0
    while (startRow < maxTestRows) {
      if (isTitleRow(st, startRow)) {
        titleRows += startRow
      } else {
        var headerRows = 1
        val bound = math.min(4, st.rows - startRow - 1)
        while (headerRows < bound) {
          val dataStart = startRow + headerRows
          val dataEnd = math.min(st.rows, dataStart + 100)
          if (dataEnd > dataStart) {
            // the type score depends only on dataStart (dataEnd derives from
            // it), and candidate windows overlap heavily — memoize instead
            // of re-scanning ~100 rows per candidate
            var ts = typeScoreCache.get(dataStart)
            if (ts == null) {
              ts = java.lang.Double.valueOf(typeConsistencyScore(st, dataStart, dataEnd))
              typeScoreCache.put(dataStart, ts)
            }
            val headerScore = headerQualityCached(startRow, startRow + headerRows)
            val coverageScore = coverage(st, startRow)
            val total = ts.doubleValue() * 0.5 + headerScore * 0.3 + coverageScore * 0.2
            if (total > bestScore) {
              bestScore = total
              bestStart = startRow
              bestEnd = startRow + headerRows
            }
          }
          headerRows += 1
        }
      }
      startRow += 1
    }

    if (bestScore > 0.5) {
      val headers = extractVerticalHeadersWithMerged(st, bestStart, bestEnd - bestStart)
      val dataStart = bestEnd
      val dataEnd = math.min(st.rows, dataStart + 100)
      val (_, columnTypes) = typeConsistency(st, dataStart, dataEnd)
      HeaderResult(hasHeaders = true, bestEnd - bestStart, 0, "vertical", headers, bestScore,
        titleRows.toVector, dataEnd - dataStart, columnTypes, "standard")
    } else {
      HeaderResult(hasHeaders = false, 0, 0, "vertical", Vector.empty, 0.0,
        titleRows.toVector)
    }
  }

  /** reference: dataframe_extractor.py:323-329. */
  private def coverage(st: SpanStats, r: Int): Double = {
    if (st.cols == 0) return 0.0
    var n = 0
    var i = 0
    while (i < st.cols) {
      if (st.nonBlank(r, i)) n += 1
      i += 1
    }
    n.toDouble / st.cols
  }

  /** Score half of [[typeConsistency]] over rows [from, until) — identical
    * counters and tie order.
    */
  private def typeConsistencyScore(st: SpanStats, from: Int, until: Int): Double = {
    if (from >= until || st.cols == 0) return 0.0
    var scoreSum = 0.0
    var scoreN = 0
    var colIdx = 0
    while (colIdx < st.cols) {
      var nNum = 0; var nText = 0; var nDate = 0; var nBool = 0
      var r = from
      while (r < until) {
        st.etypeCode(r, colIdx) match {
          case TypeInfer.EtNumeric => nNum += 1
          case TypeInfer.EtText => nText += 1
          case TypeInfer.EtDate => nDate += 1
          case TypeInfer.EtBool => nBool += 1
          case _ => ()
        }
        r += 1
      }
      val totalNonEmpty = nNum + nText + nDate + nBool
      if (totalNonEmpty > 0) {
        var domN = nNum
        if (nText > domN) domN = nText
        if (nDate > domN) domN = nDate
        if (nBool > domN) domN = nBool
        scoreSum += domN.toDouble / totalNonEmpty
        scoreN += 1
      }
      colIdx += 1
    }
    if (scoreN > 0) scoreSum / scoreN else 0.0
  }

  /** reference: dataframe_extractor.py:749-784 (dominant-type tie broken in
    * the dict insertion order numeric→text→date→boolean).
    */
  private def typeConsistency(st: SpanStats, from: Int, until: Int)
      : (Double, Map[Int, String]) = {
    if (from >= until || st.cols == 0) return (0.0, Map.empty)
    val columnTypes = mutable.LinkedHashMap.empty[Int, String]
    val scores = mutable.ArrayBuffer.empty[Double]
    var colIdx = 0
    while (colIdx < st.cols) {
      // plain counters; dominant = first max in numeric→text→date→boolean
      // order (the reference's dict insertion order)
      var nNum = 0; var nText = 0; var nDate = 0; var nBool = 0
      var r = from
      while (r < until) {
        st.etypeCode(r, colIdx) match {
          case TypeInfer.EtNumeric => nNum += 1
          case TypeInfer.EtText => nText += 1
          case TypeInfer.EtDate => nDate += 1
          case TypeInfer.EtBool => nBool += 1
          case _ => ()
        }
        r += 1
      }
      val totalNonEmpty = nNum + nText + nDate + nBool
      if (totalNonEmpty > 0) {
        var dominant = "numeric"; var domN = nNum
        if (nText > domN) { dominant = "text"; domN = nText }
        if (nDate > domN) { dominant = "date"; domN = nDate }
        if (nBool > domN) { dominant = "boolean"; domN = nBool }
        scores += domN.toDouble / totalNonEmpty
        columnTypes(colIdx) = dominant
      } else columnTypes(colIdx) = "empty"
      colIdx += 1
    }
    (if (scores.nonEmpty) scores.sum / scores.size else 0.0, columnTypes.toMap)
  }

  /** reference: dataframe_extractor.py:855-914 — note the reference looks
    * cells up at absolute column index col_idx (not offset by the range's
    * start column); replicated for fidelity (the multi-row path reads the
    * GRID at absolute columns 0..cols, not the span's columns).
    */
  private def extractVerticalHeadersWithMerged(st: SpanStats, bestStart: Int,
      headerRows: Int): Vector[String] = {
    if (headerRows == 0 || st.rows <= bestStart) return Vector.empty
    if (headerRows == 1) {
      return Vector.tabulate(st.cols) { i =>
        if (st.present(bestStart, i)) st.value(bestStart, i) else s"Col_$i"
      }
    }
    val g = st.g
    val startRow = st.r0 + bestStart
    val numCols = st.cols
    val mergedValues = mutable.HashMap.empty[String, String]
    (0 until headerRows).foreach { rowIdx =>
      (0 until numCols).foreach { colIdx =>
        val cell = g.get(startRow + rowIdx, colIdx)
        if (cell != null && cell.isMerged && cell.mergeRange != null && !cell.valueIsNull)
          mergedValues(cell.mergeRange) = cell.value.trim
      }
    }
    (0 until numCols).map { colIdx =>
      val parts = mutable.ArrayBuffer.empty[String]
      (0 until headerRows).foreach { rowIdx =>
        val cell = g.get(startRow + rowIdx, colIdx)
        if (cell != null && !cell.valueIsNull) {
          val v = cell.value.trim
          if (v.nonEmpty) parts += v
        } else if (cell != null && cell.isMerged && cell.mergeRange != null) {
          mergedValues.get(cell.mergeRange).foreach { v =>
            if (v.nonEmpty && !parts.contains(v)) parts += v
          }
        }
      }
      if (parts.nonEmpty) {
        val unique = mutable.ArrayBuffer.empty[String]
        parts.foreach { p => if (unique.isEmpty || unique.last != p) unique += p }
        unique.mkString(" ")
      } else s"Col_$colIdx"
    }.toVector
  }

  // ---- horizontal (reference: dataframe_extractor.py:266-296, 722-747) ----

  /** Horizontal candidate score + header-column count, header vector NOT
    * materialized. Reference bug kept: headers always come from column 0
    * regardless of header_cols (dataframe_extractor.py:283-286) — so the
    * header-only score terms are per-grid constants, computed charwise
    * over the col-0 spans / Col_i placeholders when the grid is narrow
    * enough for pairwise compares (rows ≤ 64; a taller grid falls back to
    * the materializing set — quadratic compares would beat string cost).
    */
  private def detectHorizontalScore(st: SpanStats): (Double, Int) = {
    if (st.rows == 0 || st.cols < 2) return (0.0, 0)
    val maxHeaderCols = math.min(3, st.cols - minDataRows)
    if (maxHeaderCols < 1) return (0.0, 0)
    val headerBase =
      if (st.rows <= 64) {
        var distinct = 0
        var textHeaders = 0
        var i = 0
        while (i < st.rows) {
          val pi = st.present(i, 0)
          // present values are nonEmpty (grids store no blank cells);
          // Col_i placeholders contain 'C' — never numeric-like
          if (!pi || !st.headerNumericLike(i)) textHeaders += 1
          var dup = false
          var j = 0
          while (j < i && !dup) {
            val pj = st.present(j, 0)
            dup =
              if (pi && pj) st.valuesEqual(i, 0, j, 0)
              else if (!pi && !pj) false // Col_i != Col_j
              else if (pi) st.headerEqualsPlaceholder(i, j)
              else st.headerEqualsPlaceholder(j, i)
            j += 1
          }
          if (!dup) distinct += 1
          i += 1
        }
        distinct.toDouble / st.rows * 0.3 + textHeaders.toDouble / st.rows * 0.3
      } else {
        val headers = horizontalHeaderVector(st)
        val d = headers.distinct.size.toDouble / headers.size * 0.3
        val textHeaders = headers.count(h => h.nonEmpty && !isNumericLike(h))
        d + textHeaders.toDouble / headers.size * 0.3
      }
    var bestScore = 0.0
    var bestCols = 0
    var headerCols = 1
    while (headerCols <= maxHeaderCols) {
      // the reference scores (headers, matrix.drop(headerCols)) per
      // candidate: same terms, column scan from headerCols, no copies
      val score = headerBase + columnTypeConsistencyFrom(st, headerCols) * 0.4
      if (score > bestScore) {
        bestScore = score
        bestCols = headerCols
      }
      headerCols += 1
    }
    (bestScore, bestCols)
  }

  /** The reference's horizontal header vector (col-0 value or Col_i) —
    * materialized only for a WINNING horizontal candidate.
    */
  private def horizontalHeaderVector(st: SpanStats): Vector[String] =
    Vector.tabulate(st.rows) { i =>
      if (st.present(i, 0)) st.value(i, 0) else s"Col_$i"
    }

  /** `isAllDigits(h.replace(".", "").replace("-", ""))` without the two
    * String copies: at least one ASCII digit and nothing but digits, '.'
    * and '-' (the replace result must be nonEmpty and all-digits).
    * reference: dataframe_extractor.py:331-379 (the header text-ness term).
    */
  private def isNumericLike(h: String): Boolean = {
    var digits = 0
    var i = 0
    while (i < h.length) {
      val ch = h.charAt(i)
      if (ch >= '0' && ch <= '9') digits += 1
      else if (ch != '.' && ch != '-') return false
      i += 1
    }
    digits > 0
  }

  /** reference: dataframe_extractor.py:381-440 (bool counts as numeric via
    * Python's bool⊂int; plain float() parse without comma stripping).
    * Columns [fromCol, cols); Cell.dataTypeCode 2/3 are number/boolean.
    */
  private def columnTypeConsistencyFrom(st: SpanStats, fromCol: Int): Double = {
    if (st.rows == 0 || st.cols <= fromCol) return 0.0
    val numCols = st.cols - fromCol
    var consistent = 0
    var colIdx = fromCol
    while (colIdx < st.cols) {
      var sawNumeric = false
      var sawText = false
      var any = false
      var r = 0
      while (r < st.rows) {
        if (st.present(r, colIdx)) {
          any = true
          val dt = st.dataTypeCode(r, colIdx)
          if (dt == 2 || dt == 3) sawNumeric = true
          else if (st.plainFloat(r, colIdx)) sawNumeric = true
          else sawText = true
        }
        r += 1
      }
      if (any && (sawNumeric ^ sawText)) consistent += 1
      colIdx += 1
    }
    consistent.toDouble / numCols
  }

  // ---- table creation + quality ----

  /** Output shape of [[createTable]] WITHOUT materializing it:
    * (fromRow, fromCol, rowCount, colCount), None exactly when createTable
    * returns None. Single source of truth for both the materializing path
    * and the stats-only kernel path.
    */
  private def tableShape(st: SpanStats, headerInfo: Option[HeaderResult])
      : Option[(Int, Int, Int, Int)] = {
    if (st.rows == 0) return None
    headerInfo match {
      case Some(hi) if hi.hasHeaders && hi.orientation == "vertical" =>
        var startRow = 0
        if (hi.titleRows.nonEmpty) {
          val titleSet = hi.titleRows.toSet
          startRow = (0 until st.rows).find(i => !titleSet.contains(i)).getOrElse(0)
        }
        val dataStart = startRow + hi.headerRows
        if (hi.headers.size != st.cols) None // pandas would raise
        else {
          val fr = math.min(dataStart, st.rows)
          Some((fr, 0, st.rows - fr, hi.headers.size))
        }
      case Some(hi) if hi.hasHeaders =>
        // pandas raises when len(columns) != data width (headers here are one
        // per ROW — the reference's transposed path fails for non-square
        // shapes); replicate by returning None on mismatch
        if (hi.headers.size != math.max(0, st.cols - hi.headerColumns)) None
        else {
          val fc = math.min(hi.headerColumns, st.cols)
          Some((0, fc, st.rows, hi.headers.size))
        }
      case _ => // no header info, or !hasHeaders: numbered columns, all rows
        Some((0, 0, st.rows, st.cols))
    }
  }

  /** reference: dataframe_extractor.py:442-481. */
  private def createTable(st: SpanStats, headerInfo: Option[HeaderResult])
      : Option[TableData] = {
    // output rows materialize as Vectors (TableData is the public surface)
    def rowsFrom(fromRow: Int, fromCol: Int): Vector[Vector[String]] =
      Vector.tabulate(st.rows - fromRow) { r =>
        Vector.tabulate(st.cols - fromCol) { c =>
          if (st.present(fromRow + r, fromCol + c)) st.value(fromRow + r, fromCol + c)
          else null
        }
      }
    tableShape(st, headerInfo).map { case (fr, fc, _, _) =>
      val columns = headerInfo match {
        case Some(hi) if hi.hasHeaders => hi.headers
        case _ => (0 until st.cols).map(_.toString).toVector
      }
      TableData(columns, rowsFrom(fr, fc))
    }
  }

  /** reference: dataframe_extractor.py:483-514. */
  def qualityScore(t: TableData, headerInfo: Option[HeaderResult], density: Double): Double = {
    val nonNull = t.rows.iterator.map(_.count(_ != null)).sum
    qualityScoreStats(t.rowCount, t.colCount, nonNull, headerInfo, density)
  }

  private def qualityScoreStats(rows: Int, cols: Int, nonNull: Long,
      headerInfo: Option[HeaderResult], density: Double): Double = {
    var score = density * 0.3
    headerInfo match {
      case Some(hi) if hi.hasHeaders => score += hi.confidence * 0.3
      case _ => score += 0.1
    }
    if (rows >= minDataRows && cols > 0) {
      val aspect = math.min(rows.toDouble / cols, cols.toDouble / rows)
      score += math.min(1.0, aspect / 0.1) * 0.2
    }
    val total = rows.toLong * cols
    if (total > 0) score += (nonNull.toDouble / total) * 0.2
    math.min(1.0, score)
  }

  /** The kernel-pipeline variant of [[extract]]: same span view, density
    * gate, header detection, shape logic and quality arithmetic — but the
    * TableData row Vectors are never materialized (the pipeline only ships
    * (rows, cols, quality) on the span; the created rows were discarded).
    * Returns (Some((rowCount, colCount)) iff extract would return a table,
    * headerInfo, quality) — equality with extract() is asserted per golden
    * fixture in OperatorGoldenSpec.
    */
  def extractStats(g: CellGrid, span: Span): (Option[(Int, Int)], Option[HeaderResult], Double) = {
    val st = spanStats(g, span) match {
      case None => return (None, None, 0.0)
      case Some(s) => s
    }
    val density = calcDensity(st)
    if (density < minDataDensity) return (None, None, 0.0)
    val headerInfo = Some(detectHeaderInfo(st))
    tableShape(st, headerInfo) match {
      case None => (None, headerInfo, 0.0)
      case Some((fr, fc, nr, nc)) =>
        if (nr < minDataRows) {
          if (headerInfo.exists(_.tableType == "plate_map"))
            (Some((nr, nc)), headerInfo, 0.95)
          else (None, headerInfo, 0.0)
        } else {
          // nonNull over the same region createTable would materialize
          // (present cells always have a non-null value — the grid stores
          // neither empty nor null-valued cells)
          var nonNull = 0L
          var r = fr
          while (r < st.rows) {
            var c = fc
            while (c < st.cols) {
              if (st.present(r, c)) nonNull += 1
              c += 1
            }
            r += 1
          }
          (Some((nr, nc)), headerInfo,
            qualityScoreStats(nr, nc, nonNull, headerInfo, density))
        }
    }
  }
}
