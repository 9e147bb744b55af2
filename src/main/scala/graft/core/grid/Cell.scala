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
class Cell private[grid] (
    val value: String,
    val raw: String,
    val row: Int,
    val col: Int,
    // closed-domain attributes packed into one int (slab-style compaction:
    // drops 5 object refs + 2 boolean fields per cell on the dense path —
    // the detectors see the same String/Boolean API via the accessors):
    //   bit 0 bold, bit 1 merged, bits 2-3/4-5/6-7/8-9 borders (t/b/l/r),
    //   bits 10-12 dataType
    private val packed: Int
) extends Serializable {

  // rare formatting attributes live only on [[FormattedCell]] (two-tier
  // slab split): the overwhelmingly common unformatted cell — every
  // delimited/text cell and most HTML cells — carries none of the five
  // rare refs, shrinking the per-cell footprint by ~24 B. Construct via
  // Cell.of, which picks the tier.
  def alignment: String = null
  def mergeRange: String = null
  def fontSize: Double = 0.0 // 0.0 == unset
  def fontColor: String = null
  def backgroundColor: String = null

  def this(value: String, raw: String, dataType: String, row: Int, col: Int) =
    this(value, raw, row, col, Cell.dtCode(dataType) << 10)

  @inline def isBold: Boolean = (packed & 1) != 0
  @inline def isMerged: Boolean = (packed & 2) != 0
  @inline def borderTop: String = Cell.Borders((packed >>> 2) & 3)
  @inline def borderBottom: String = Cell.Borders((packed >>> 4) & 3)
  @inline def borderLeft: String = Cell.Borders((packed >>> 6) & 3)
  @inline def borderRight: String = Cell.Borders((packed >>> 8) & 3)
  @inline def dataType: String = Cell.DataTypes((packed >>> 10) & 7)
  /** Small stable code for dataType (index into Cell.DataTypes) — lets
    * per-column type tallies use a primitive array instead of a boxed map.
    */
  @inline def dataTypeCode: Int = (packed >>> 10) & 7

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

/** The rare tier: a cell that actually carries CSS-derived formatting
  * attributes (alignment / merge range / font size / colors). Allocated by
  * [[Cell.of]] only when at least one of them is set.
  */
final class FormattedCell private[grid] (
    value: String, raw: String, row: Int, col: Int, packed: Int,
    override val alignment: String,
    override val mergeRange: String,
    override val fontSize: Double,
    override val fontColor: String,
    override val backgroundColor: String
) extends Cell(value, raw, row, col, packed)

object Cell {
  // border level domain is closed (Css.level: null/thin/medium/thick;
  // "none" behaves as null for hasBorder and is mapped to it)
  private[grid] val Borders = Array[String](null, "thin", "medium", "thick")
  private[grid] def borderCode(s: String): Int = s match {
    case null | "none" => 0
    case "thin" => 1
    case "medium" => 2
    case "thick" => 3
    case _ => 1 // unknown style string: visible border, thin
  }

  // TypeInfer.infer emits exactly these; index 0 covers null/unknown
  private[grid] val DataTypes =
    Array[String](null, "string", "number", "boolean", "date", "datetime", "empty")
  private[grid] def dtCode(s: String): Int = s match {
    case null => 0
    case "string" => 1
    case "number" => 2
    case "boolean" => 3
    case "date" => 4
    case "datetime" => 5
    case "empty" => 6
    // the domain is closed (TypeInfer emits exactly the strings above);
    // fail loudly so a typo'd fixture dataType can't round-trip as "string"
    // and mask golden drift
    case other => throw new IllegalArgumentException(s"unknown dataType: '$other'")
  }

  /** Full-attribute factory: picks the slim [[Cell]] tier when none of the
    * five rare formatting refs is set, [[FormattedCell]] otherwise.
    */
  def of(value: String, raw: String, dataType: String, row: Int, col: Int,
      isBold: Boolean = false, alignment: String = null,
      borderTop: String = null, borderBottom: String = null,
      borderLeft: String = null, borderRight: String = null,
      isMerged: Boolean = false, mergeRange: String = null,
      fontSize: Double = 0.0, fontColor: String = null,
      backgroundColor: String = null): Cell = {
    val packed = (if (isBold) 1 else 0) | (if (isMerged) 2 else 0) |
      (borderCode(borderTop) << 2) | (borderCode(borderBottom) << 4) |
      (borderCode(borderLeft) << 6) | (borderCode(borderRight) << 8) |
      (dtCode(dataType) << 10)
    if (alignment == null && mergeRange == null && fontSize == 0.0 &&
        fontColor == null && backgroundColor == null)
      new Cell(value, raw, row, col, packed)
    else
      new FormattedCell(value, raw, row, col, packed,
        alignment, mergeRange, fontSize, fontColor, backgroundColor)
  }

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

  /** Tuple-free variant for the per-row kernel loops: `res` is a
    * caller-owned scratch reused across cells.
    */
  def inferred(v: String, row: Int, col: Int, res: TypeInfer.Res): Cell = {
    TypeInfer.inferInto(v, res)
    new Cell(res.py, v, res.dt, row, col)
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
