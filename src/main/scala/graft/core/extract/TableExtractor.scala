package graft.core.extract

import scala.collection.mutable
import graft.core.grid.{Cell, CellGrid, Span, TypeInfer}

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

/** Port of the reference's DataFrame extraction with intelligent header
  * detection (reference: extractors/dataframe_extractor.py:39-914): density
  * gate, plate-map detection, enhanced vertical header scoring
  * (0.5·type-consistency + 0.3·header-quality + 0.2·coverage), horizontal
  * (transposed) detection, title-row skipping, multi-row merged-aware
  * header extraction, and the 4-component quality score.
  */
final class TableExtractor(minDataRows: Int = 2, minDataDensity: Double = 0.3) {

  private val PlateFormats: Seq[(Int, Seq[(Int, Int)])] = Seq(
    6 -> Seq((2, 3), (3, 2)),
    24 -> Seq((4, 6), (6, 4)),
    96 -> Seq((8, 12), (12, 8)),
    384 -> Seq((16, 24), (24, 16)),
    1536 -> Seq((32, 48), (48, 32))
  )

  /** reference: dataframe_extractor.py:52-116. */
  def extract(g: CellGrid, span: Span, detectHeaders: Boolean = true)
      : (Option[TableData], Option[HeaderResult], Double) = {
    val matrix: Vector[Vector[Cell]] =
      (span.r0 to span.r1).map { r =>
        (span.c0 to span.c1).map { c =>
          val cell = g.get(r, c)
          if (cell == null || cell.isEmpty) null else cell
        }.toVector
      }.toVector
    if (matrix.isEmpty || matrix.head.isEmpty) return (None, None, 0.0)

    val density = calcDensity(matrix)
    if (density < minDataDensity) return (None, None, 0.0)

    val headerInfo = if (detectHeaders) Some(detectHeaderInfo(matrix, g, span)) else None
    val table = createTable(matrix, headerInfo)
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
  def calcDensity(matrix: Vector[Vector[Cell]]): Double = {
    val total = matrix.size.toLong * (if (matrix.nonEmpty) matrix.head.size else 0)
    if (total == 0) return 0.0
    val nonEmpty = matrix.iterator.map(_.count(_ != null)).sum
    nonEmpty.toDouble / total
  }

  /** reference: dataframe_extractor.py:185-240. */
  def detectHeaderInfo(matrix: Vector[Vector[Cell]], g: CellGrid, span: Span): HeaderResult = {
    detectPlateFormat(matrix).getOrElse {
      val vertical = detectVerticalEnhanced(matrix, g, span)
      val horizontal = detectHorizontalEnhanced(matrix)
      if (vertical.confidence > horizontal.confidence) vertical else horizontal
    }
  }

  // ---- plate maps (reference: dataframe_extractor.py:516-614) ----

  def detectPlateFormat(matrix: Vector[Vector[Cell]]): Option[HeaderResult] = {
    if (matrix.size < 3) return None
    var bestScore = 0
    var best: Option[(Int, Int)] = None
    PlateFormats.foreach { case (wells, dims) =>
      dims.foreach { case (rows, cols) =>
        if (matrix.size >= rows + 1 && matrix.head.size >= cols + 1 &&
            checkPlateRowLabels(matrix, rows) && checkPlateColLabels(matrix.head, cols)) {
          val rowDiff = math.abs(matrix.size - (rows + 1))
          val colDiff = math.abs(matrix.head.size - (cols + 1))
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
    * present (non-null) labels, in order, must equal exactly A..<expected>;
    * compared with a trim-bounds walk instead of building both sequences
    * (labels are single letters, so per-char case folding is exact).
    */
  def checkPlateRowLabels(matrix: Vector[Vector[Cell]], expectedRows: Int): Boolean = {
    if (matrix.size < expectedRows + 1) return false
    var k = 0
    var i = 1
    val until = math.min(expectedRows + 1, matrix.size)
    while (i < until) {
      val c = matrix(i).headOption.orNull
      if (c != null && c.value != null) {
        if (k >= expectedRows) return false // more labels than expected
        val v = c.value
        var a = 0
        var b = v.length
        while (a < b && Character.isWhitespace(v.charAt(a))) a += 1
        while (b > a && Character.isWhitespace(v.charAt(b - 1))) b -= 1
        if (b - a != 1) return false
        if (Character.toUpperCase(v.charAt(a)) != ('A' + k).toChar) return false
        k += 1
      }
      i += 1
    }
    k == expectedRows
  }

  /** reference: dataframe_extractor.py:599-614. */
  def checkPlateColLabels(headerRow: Vector[Cell], expectedCols: Int): Boolean = {
    if (headerRow.size < expectedCols + 1) return false
    (1 until math.min(expectedCols + 1, headerRow.size)).forall { i =>
      val c = headerRow(i)
      c != null && c.value != null && {
        try Integer.parseInt(c.value.trim) == i
        catch { case _: NumberFormatException => false }
      }
    }
  }

  // ---- vertical (reference: dataframe_extractor.py:627-720) ----

  /** Title rows have ≤2 filled cells of >3 (dataframe_extractor.py:616-625).
    */
  def isTitleRow(row: Vector[Cell]): Boolean = {
    val filled = row.count(c => c != null && nonBlank(c.value))
    filled <= 2 && row.size > 3
  }

  def detectVerticalEnhanced(matrix: Vector[Vector[Cell]], g: CellGrid, span: Span)
      : HeaderResult = {
    if (matrix.size < 2)
      return HeaderResult(hasHeaders = false, 0, 0, "vertical", Vector.empty, 0.0)

    var bestScore = 0.0
    var bestStart = 0
    var bestEnd = 0
    val titleRows = mutable.ArrayBuffer.empty[Int]
    val typeScoreCache = new java.util.HashMap[Int, java.lang.Double]()

    // per-row header-quality terms, computed once (candidate windows
    // overlap): the text/filled ratio and the row's distinct-value ratio.
    // Same values and summation order as headerQualityMulti over a slice.
    val qRows = math.min(matrix.size, 13) // startRow < 10, headerRows <= 3
    val rowRatio = new Array[Double](qRows)
    val rowHasFilled = new Array[Boolean](qRows)
    val lastRatio = new Array[Double](qRows)
    val lastNonEmpty = new Array[Boolean](qRows)
    var qi = 0
    while (qi < qRows) {
      val row = matrix(qi)
      var textCount = 0
      var filled = 0
      row.foreach { c =>
        if (c != null && nonBlank(c.value)) {
          filled += 1
          if (TypeInfer.extractorType(c) == "text") textCount += 1
        }
      }
      rowHasFilled(qi) = filled > 0
      if (filled > 0) rowRatio(qi) = textCount.toDouble / filled
      val filledValues = row.flatMap { c =>
        if (c != null && nonBlank(c.value)) Some(c.value) else None
      }
      lastNonEmpty(qi) = filledValues.nonEmpty
      if (filledValues.nonEmpty)
        lastRatio(qi) = filledValues.distinct.size.toDouble / filledValues.size
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

    val maxTestRows = math.min(10, matrix.size - 2)
    var startRow = 0
    while (startRow < maxTestRows) {
      if (isTitleRow(matrix(startRow))) {
        titleRows += startRow
      } else {
        var headerRows = 1
        val bound = math.min(4, matrix.size - startRow - 1)
        while (headerRows < bound) {
          val dataStart = startRow + headerRows
          val dataEnd = math.min(matrix.size, dataStart + 100)
          if (dataEnd > dataStart) {
            // the type score depends only on dataStart (dataEnd derives from
            // it), and candidate windows overlap heavily — memoize instead
            // of re-slicing + re-scanning ~100 rows per candidate
            var ts = typeScoreCache.get(dataStart)
            if (ts == null) {
              ts = java.lang.Double.valueOf(typeConsistencyScore(matrix, dataStart, dataEnd))
              typeScoreCache.put(dataStart, ts)
            }
            val headerScore = headerQualityCached(startRow, startRow + headerRows)
            val coverageScore = coverage(matrix(startRow))
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
      val headers = extractVerticalHeadersWithMerged(
        matrix.slice(bestStart, bestEnd), bestEnd - bestStart, g, span.r0 + bestStart)
      val dataStart = bestEnd
      val dataEnd = math.min(matrix.size, dataStart + 100)
      val sample = matrix.slice(dataStart, dataEnd)
      val (_, columnTypes) = typeConsistency(sample)
      HeaderResult(hasHeaders = true, bestEnd - bestStart, 0, "vertical", headers, bestScore,
        titleRows.toVector, sample.size, columnTypes, "standard")
    } else {
      HeaderResult(hasHeaders = false, 0, 0, "vertical", Vector.empty, 0.0,
        titleRows.toVector)
    }
  }

  /** reference: dataframe_extractor.py:323-329. */
  def coverage(row: Vector[Cell]): Double = {
    if (row.isEmpty) return 0.0
    row.count(c => c != null && c.value != null && c.value.trim.nonEmpty).toDouble / row.size
  }

  /** Score half of `typeConsistency` over matrix rows [from, until) without
    * materializing the slice — identical counters and tie order.
    */
  private def typeConsistencyScore(matrix: Vector[Vector[Cell]], from: Int, until: Int): Double = {
    if (from >= until || matrix(from).isEmpty) return 0.0
    var scoreSum = 0.0
    var scoreN = 0
    val nCols = matrix(from).size
    var colIdx = 0
    while (colIdx < nCols) {
      var nNum = 0; var nText = 0; var nDate = 0; var nBool = 0
      var r = from
      while (r < until) {
        val row = matrix(r)
        if (colIdx < row.size) {
          TypeInfer.extractorType(row(colIdx)) match {
            case "numeric" => nNum += 1
            case "text" => nText += 1
            case "date" => nDate += 1
            case "boolean" => nBool += 1
            case _ => ()
          }
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
  def typeConsistency(sample: Vector[Vector[Cell]]): (Double, Map[Int, String]) = {
    if (sample.isEmpty || sample.head.isEmpty) return (0.0, Map.empty)
    val columnTypes = mutable.LinkedHashMap.empty[Int, String]
    val scores = mutable.ArrayBuffer.empty[Double]
    val nCols = sample.head.size
    var colIdx = 0
    while (colIdx < nCols) {
      // plain counters; dominant = first max in numeric→text→date→boolean
      // order (the reference's dict insertion order)
      var nNum = 0; var nText = 0; var nDate = 0; var nBool = 0
      sample.foreach { row =>
        if (colIdx < row.size) {
          TypeInfer.extractorType(row(colIdx)) match {
            case "numeric" => nNum += 1
            case "text" => nText += 1
            case "date" => nDate += 1
            case "boolean" => nBool += 1
            case _ => ()
          }
        }
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

  /** Allocation-free equivalent of `v.trim.nonEmpty` — the ONE blankness
    * predicate for this extractor (headerQualityMulti/coverage use
    * `trim.nonEmpty` directly, so the memoized header path must agree;
    * `trim` strips chars <= U+0020, NOT Character.isWhitespace's set).
    */
  @inline private def nonBlank(v: String): Boolean = {
    if (v == null) return false
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) > ' ') return true
      i += 1
    }
    false
  }

  /** reference: dataframe_extractor.py:821-853. */
  def headerQualityMulti(headerRows: Vector[Vector[Cell]]): Double = {
    if (headerRows.isEmpty) return 0.0
    val scores = mutable.ArrayBuffer.empty[Double]
    headerRows.foreach { row =>
      var textCount = 0
      var filled = 0
      row.foreach { c =>
        if (c != null && c.value != null && c.value.trim.nonEmpty) {
          filled += 1
          if (TypeInfer.extractorType(c) == "text") textCount += 1
        }
      }
      if (filled > 0) scores += textCount.toDouble / filled
    }
    val last = headerRows.last
    val filledValues = last.flatMap { c =>
      if (c != null && c.value != null && c.value.trim.nonEmpty) Some(c.value) else None
    }
    if (filledValues.nonEmpty)
      scores += filledValues.distinct.size.toDouble / filledValues.size
    if (scores.nonEmpty) scores.sum / scores.size else 0.0
  }

  /** reference: dataframe_extractor.py:855-914 — note the reference looks
    * cells up at absolute column index col_idx (not offset by the range's
    * start column); replicated for fidelity.
    */
  def extractVerticalHeadersWithMerged(headerMatrix: Vector[Vector[Cell]], headerRows: Int,
      g: CellGrid, startRow: Int): Vector[String] = {
    if (headerMatrix.isEmpty || headerRows == 0) return Vector.empty
    if (headerRows == 1) {
      return headerMatrix.head.zipWithIndex.map { case (c, i) =>
        if (c != null && c.value != null) c.value else s"Col_$i"
      }
    }
    val numCols = headerMatrix.head.size
    val mergedValues = mutable.HashMap.empty[String, String]
    (0 until headerRows).foreach { rowIdx =>
      (0 until numCols).foreach { colIdx =>
        val cell = g.get(startRow + rowIdx, colIdx)
        if (cell != null && cell.isMerged && cell.mergeRange != null && cell.value != null)
          mergedValues(cell.mergeRange) = cell.value.trim
      }
    }
    (0 until numCols).map { colIdx =>
      val parts = mutable.ArrayBuffer.empty[String]
      (0 until headerRows).foreach { rowIdx =>
        val cell = g.get(startRow + rowIdx, colIdx)
        if (cell != null && cell.value != null) {
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

  def detectHorizontalEnhanced(matrix: Vector[Vector[Cell]]): HeaderResult = {
    if (matrix.isEmpty || matrix.head.size < 2)
      return HeaderResult(hasHeaders = false, 0, 0, "horizontal", Vector.empty, 0.0)
    val (score, headers, cols) = detectHorizontal(matrix)
    HeaderResult(hasHeaders = score > 0.5, 0, cols, "horizontal", headers, score)
  }

  private def detectHorizontal(matrix: Vector[Vector[Cell]]): (Double, Vector[String], Int) = {
    val numCols = matrix.head.size
    val maxHeaderCols = math.min(3, numCols - minDataRows)
    var bestScore = 0.0
    var bestHeaders = Vector.empty[String]
    var bestCols = 0
    // reference bug kept: headers always from column 0 regardless of
    // header_cols (dataframe_extractor.py:283-286) — identical every
    // iteration, so hoisted, along with the header-only score terms
    val headers =
      if (maxHeaderCols < 1) Vector.empty[String]
      else matrix.zipWithIndex.map { case (row, i) =>
        val c = row.headOption.orNull
        if (c != null && c.value != null) c.value else s"Col_$i"
      }
    val headerBase =
      if (headers.isEmpty) 0.0
      else {
        val d = headers.distinct.size.toDouble / headers.size * 0.3
        val textHeaders = headers.count { h =>
          h != null && h.nonEmpty && !isAllDigits(h.replace(".", "").replace("-", ""))
        }
        d + textHeaders.toDouble / headers.size * 0.3
      }
    var headerCols = 1
    while (headerCols <= maxHeaderCols) {
      // scoreHeaders(headers, matrix.map(_.drop(headerCols))) without the
      // per-candidate matrix copy: same terms, column scan from headerCols
      val score =
        if (headers.isEmpty || matrix.isEmpty) 0.0
        else headerBase + columnTypeConsistencyFrom(matrix, headerCols) * 0.4
      if (score > bestScore) {
        bestScore = score
        bestHeaders = headers
        bestCols = headerCols
      }
      headerCols += 1
    }
    (bestScore, bestHeaders, bestCols)
  }

  /** reference: dataframe_extractor.py:331-379. */
  def scoreHeaders(headers: Vector[String], dataRows: Vector[Vector[Cell]]): Double = {
    if (headers.isEmpty || dataRows.isEmpty) return 0.0
    var score = 0.0
    score += headers.distinct.size.toDouble / headers.size * 0.3
    val textHeaders = headers.count { h =>
      h != null && h.nonEmpty && !isAllDigits(h.replace(".", "").replace("-", ""))
    }
    score += textHeaders.toDouble / headers.size * 0.3
    score += columnTypeConsistency(dataRows) * 0.4
    score
  }

  private def isAllDigits(s: String): Boolean =
    s.nonEmpty && s.forall(c => c >= '0' && c <= '9')

  /** reference: dataframe_extractor.py:381-440 (bool counts as numeric via
    * Python's bool⊂int; plain float() parse without comma stripping).
    */
  def columnTypeConsistency(dataRows: Vector[Vector[Cell]]): Double = {
    if (dataRows.isEmpty || dataRows.head.isEmpty) return 0.0
    val numCols = dataRows.head.size
    var consistent = 0
    (0 until numCols).foreach { colIdx =>
      val types = mutable.HashSet.empty[String]
      var any = false
      dataRows.foreach { row =>
        if (colIdx < row.size && row(colIdx) != null) {
          val c = row(colIdx)
          any = true
          c.dataType match {
            case "number" | "boolean" => types += "numeric"
            case _ =>
              if (plainFloatParses(c.value)) types += "numeric" else types += "text"
          }
        }
      }
      if (any && types.size == 1) consistent += 1
    }
    consistent.toDouble / numCols
  }

  /** `columnTypeConsistency(matrix.map(_.drop(fromCol)))` without the copy:
    * the matrix is rectangular over its span, so dropping columns maps to
    * scanning original indices [fromCol, width).
    */
  private def columnTypeConsistencyFrom(matrix: Vector[Vector[Cell]], fromCol: Int): Double = {
    if (matrix.isEmpty || matrix.head.size <= fromCol) return 0.0
    val numCols = matrix.head.size - fromCol
    var consistent = 0
    var colIdx = fromCol
    while (colIdx < matrix.head.size) {
      var sawNumeric = false
      var sawText = false
      var any = false
      matrix.foreach { row =>
        if (colIdx < row.size && row(colIdx) != null) {
          val c = row(colIdx)
          any = true
          c.dataType match {
            case "number" | "boolean" => sawNumeric = true
            case _ =>
              if (plainFloatParses(c.value)) sawNumeric = true else sawText = true
          }
        }
      }
      if (any && (sawNumeric ^ sawText)) consistent += 1
      colIdx += 1
    }
    consistent.toDouble / numCols
  }

  private val PlainFloatRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r
  private def plainFloatParses(v: String): Boolean =
    v != null && PlainFloatRe.matches(v.trim)

  // ---- table creation + quality ----

  /** reference: dataframe_extractor.py:442-481. */
  def createTable(matrix: Vector[Vector[Cell]], headerInfo: Option[HeaderResult])
      : Option[TableData] = {
    if (matrix.isEmpty) return None
    def cellStr(c: Cell): String = if (c == null || c.value == null) null else c.value
    headerInfo match {
      case None =>
        Some(TableData((0 until matrix.head.size).map(_.toString).toVector,
          matrix.map(_.map(cellStr))))
      case Some(hi) if !hi.hasHeaders =>
        Some(TableData((0 until matrix.head.size).map(_.toString).toVector,
          matrix.map(_.map(cellStr))))
      case Some(hi) if hi.orientation == "vertical" =>
        var startRow = 0
        if (hi.titleRows.nonEmpty) {
          val titleSet = hi.titleRows.toSet
          startRow = matrix.indices.find(i => !titleSet.contains(i)).getOrElse(0)
        }
        val dataStart = startRow + hi.headerRows
        val dataRows = matrix.drop(dataStart)
        if (hi.headers.size != matrix.head.size) None // pandas would raise
        else Some(TableData(hi.headers, dataRows.map(_.map(cellStr))))
      case Some(hi) =>
        val dataMatrix = matrix.map(_.drop(hi.headerColumns))
        // pandas raises when len(columns) != data width (headers here are one
        // per ROW — the reference's transposed path fails for non-square
        // shapes); replicate by returning None on mismatch
        if (dataMatrix.isEmpty || hi.headers.size != dataMatrix.head.size) None
        else Some(TableData(hi.headers, dataMatrix.map(_.map(cellStr))))
    }
  }

  /** reference: dataframe_extractor.py:483-514. */
  def qualityScore(t: TableData, headerInfo: Option[HeaderResult], density: Double): Double = {
    var score = density * 0.3
    headerInfo match {
      case Some(hi) if hi.hasHeaders => score += hi.confidence * 0.3
      case _ => score += 0.1
    }
    val rows = t.rowCount
    val cols = t.colCount
    if (rows >= minDataRows && cols > 0) {
      val aspect = math.min(rows.toDouble / cols, cols.toDouble / rows)
      score += math.min(1.0, aspect / 0.1) * 0.2
    }
    val nonNull = t.rows.iterator.map(_.count(_ != null)).sum
    val total = rows.toLong * cols
    if (total > 0) score += (nonNull.toDouble / total) * 0.2
    math.min(1.0, score)
  }
}
