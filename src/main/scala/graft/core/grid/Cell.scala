package graft.core.grid

/** One cell of a sparse grid.
  *
  * Mirrors the attribute surface of the reference cell model
  * (reference: src/gridgulp/models/sheet_data.py:24-106) that the detectors
  * consume: value + inferred type, bold/alignment, four border styles, and
  * merge info. `value` is the Python-`str()`-compatible rendering of the
  * converted value (what header extraction sees); `raw` keeps the original
  * source string (the reference's `formatted_value`).
  */
final class Cell(
    val value: String,
    val raw: String,
    val dataType: String, // string | number | boolean | date | datetime | empty
    val row: Int,
    val col: Int,
    val isBold: Boolean = false,
    val alignment: String = null, // left | center | right | null
    val borderTop: String = null, // none | thin | medium | thick | null
    val borderBottom: String = null,
    val borderLeft: String = null,
    val borderRight: String = null,
    val isMerged: Boolean = false,
    val mergeRange: String = null,
    val fontSize: Double = 0.0, // 0.0 == unset
    val fontColor: String = null,
    val backgroundColor: String = null
) extends Serializable {

  /** reference: sheet_data.py:67-70 — empty when value is None or blank.
    * Allocation-free (trim-isEmpty is a kernel hot path).
    */
  def isEmpty: Boolean = {
    if (value == null) return true
    var i = 0
    val n = value.length
    while (i < n) {
      if (!Character.isWhitespace(value.charAt(i))) return false
      i += 1
    }
    true
  }

  /** Memoized TypeInfer.extractorType verdict — the extractor's header
    * scoring queries the same cell O(candidate-windows) times per span.
    */
  private[grid] var extractorTypeCache: String = null

  @inline def hasBorder(s: String): Boolean = s != null && s != "none"
}

object Cell {
  /** String cell with no formatting (text-reader path,
    * reference: readers/text_reader.py:339-346).
    */
  def str(v: String, row: Int, col: Int): Cell =
    new Cell(v, v, "string", row, col)

  /** Cell with CSV-style type inference
    * (reference: readers/csv_reader.py:307-369).
    */
  def inferred(v: String, row: Int, col: Int): Cell = {
    val (py, dt) = TypeInfer.infer(v)
    new Cell(py, v, dt, row, col)
  }
}

/** Closed rectangle, 0-based inclusive (reference: models/table.py:8-78). */
final case class Span(r0: Int, c0: Int, r1: Int, c1: Int) {
  def rowCount: Int = r1 - r0 + 1
  def colCount: Int = c1 - c0 + 1
  def area: Long = rowCount.toLong * colCount
  def a1: String = s"${A1.colLetter(c0)}${r0 + 1}:${A1.colLetter(c1)}${r1 + 1}"
  def contains(r: Int, c: Int): Boolean = r >= r0 && r <= r1 && c >= c0 && c <= c1
}

/** A detected table (reference: models/table.py:103-151). */
final case class TableHit(
    id: String,
    span: Span,
    confidence: Double,
    method: String,
    hasHeaders: Boolean,
    headers: Vector[String],
    meta: Map[String, String] = Map.empty
)

/** Excel A1 address codec (reference: utils/excel_utils.py:6-133). */
object A1 {
  def colLetter(col0: Int): String = {
    var c = col0
    val sb = new StringBuilder
    while (c >= 0) {
      sb.insert(0, ('A' + c % 26).toChar)
      c = c / 26 - 1
    }
    sb.toString
  }

  def colIndex(letters: String): Int = {
    var c = 0
    letters.foreach { ch => c = c * 26 + (ch.toUpper - 'A' + 1) }
    c - 1
  }

  /** "B3" -> (2, 1), 0-based. */
  def cellToIndices(cell: String): (Int, Int) = {
    val letters = cell.takeWhile(_.isLetter)
    val digits = cell.drop(letters.length)
    (digits.toInt - 1, colIndex(letters))
  }

  /** "A1:C3" -> Span. */
  def parseRange(s: String): Span = {
    val Array(a, b) = s.split(":", 2)
    val (r0, c0) = cellToIndices(a)
    val (r1, c1) = cellToIndices(b)
    Span(r0, c0, r1, c1)
  }
}
