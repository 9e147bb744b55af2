package graft.core.grid

/** Sparse cell grid keyed by packed (row,col) longs.
  *
  * Mirrors the reference's sparse dict-of-cells sheet model
  * (reference: models/sheet_data.py:109-325) with O(1) random access and a
  * deterministic sorted iteration order (the reference re-sorts before any
  * order-sensitive step, island_detector.py:658). Backed by a primitive
  * open-addressing map — the kernel is allocation-bound otherwise.
  */
final class CellGrid private (capacityHint: Int, denseRows: Int, denseCols: Int)
    extends Serializable {
  private var map: LongObjMap[Cell] = null
  // dense row-major backing, active when bounds were declared up front
  // (CellGrid.dense — the parse paths know their dimensions): no hash
  // probes on the detect path's random access, no growth copies, and
  // cellsSorted needs no sort. A cell outside the declared bounds migrates
  // the grid to the map transparently (ragged rows).
  private var dArr: Array[Cell] = null
  private var dW = 0
  private var dH = 0
  private var _size = 0
  private var _maxRow: Int = 0
  private var _maxCol: Int = 0
  private var sortedCache: Array[Cell] = null

  if (denseRows > 0 && denseCols > 0) {
    dArr = new Array[Cell](denseRows * denseCols)
    dH = denseRows
    dW = denseCols
  } else map = new LongObjMap[Cell](math.max(8, capacityHint))

  def this(capacityHint: Int = 8) = this(capacityHint, 0, 0)

  @inline private def key(r: Int, c: Int): Long = (r.toLong << 32) | (c & 0xffffffffL)

  def maxRow: Int = _maxRow
  def maxCol: Int = _maxCol
  def size: Int = _size
  def hasData: Boolean = _size > 0

  /** Dense-backing geometry for detector fast paths: width (resp. height)
    * of the flat row-major backing, or -1 when map-backed. A dense grid
    * stores only non-empty cells inside [0,h)×[0,w), so `get(r,c) != null`
    * is a complete membership test over that box.
    */
  private[graft] def denseWidth: Int = if (dArr != null) dW else -1
  private[graft] def denseHeight: Int = if (dArr != null) dH else -1

  private def migrateToMap(): Unit = {
    map = new LongObjMap[Cell](math.max(8, _size * 2))
    var i = 0
    while (i < dArr.length) {
      val cell = dArr(i)
      if (cell != null) map.put(key(cell.row, cell.col), cell)
      i += 1
    }
    dArr = null
    dW = 0
    dH = 0
  }

  /** Store a cell; empty cells are skipped (reference only stores non-empty,
    * csv_reader.py:248, text_reader.py:337).
    */
  def put(cell: Cell): Unit = {
    if (cell != null && !cell.isEmpty) {
      // fail loudly on both backings (the map path would throw inside
      // LongObjMap; the dense path would index out of bounds or corrupt)
      require(cell.row >= 0 && cell.col >= 0, "negative cell coordinates")
      if (dArr != null) {
        if (cell.row < dH && cell.col < dW) {
          val i = cell.row * dW + cell.col
          if (dArr(i) == null) _size += 1
          dArr(i) = cell
        } else {
          migrateToMap()
          val before = map.size
          map.put(key(cell.row, cell.col), cell)
          if (map.size != before) _size += 1
        }
      } else {
        val before = map.size
        map.put(key(cell.row, cell.col), cell)
        if (map.size != before) _size += 1
      }
      if (cell.row > _maxRow) _maxRow = cell.row
      if (cell.col > _maxCol) _maxCol = cell.col
      sortedCache = null
    }
  }

  def get(r: Int, c: Int): Cell =
    if (r < 0 || c < 0) null
    else if (dArr != null) { if (r < dH && c < dW) dArr(r * dW + c) else null }
    else map.get(key(r, c))

  def contains(r: Int, c: Int): Boolean = {
    val cell = get(r, c)
    cell != null && !cell.isEmpty
  }

  /** All stored cells, sorted by (row, col) for deterministic traversal. */
  def cellsSorted: Array[Cell] = {
    if (sortedCache == null) {
      val arr = new Array[Cell](_size)
      if (dArr != null) {
        // row-major scan IS (row, col) order — no sort needed
        var i = 0
        var j = 0
        while (i < dArr.length) {
          val c = dArr(i)
          if (c != null) { arr(j) = c; j += 1 }
          i += 1
        }
      } else {
        var i = 0
        map.foreachValue { c => arr(i) = c; i += 1 }
        java.util.Arrays.sort(arr, (a: Cell, b: Cell) => {
          val dr = Integer.compare(a.row, b.row)
          if (dr != 0) dr else Integer.compare(a.col, b.col)
        })
      }
      sortedCache = arr
    }
    sortedCache
  }

  /** Packed coordinates of all (non-empty) cells, sorted. */
  def coordsSorted: Array[Long] = {
    val cs = cellsSorted
    val out = new Array[Long](cs.length)
    var i = 0
    while (i < cs.length) { out(i) = key(cs(i).row, cs(i).col); i += 1 }
    out
  }

  /** Count of non-empty cells inside a closed rectangle. */
  def countIn(r0: Int, r1: Int, c0: Int, c1: Int): Int = {
    val area = (r1 - r0 + 1).toLong * (c1 - c0 + 1)
    if (area > _size.toLong * 2) {
      // sparse: iterate stored cells
      var n = 0
      val cs = cellsSorted
      var i = 0
      while (i < cs.length) {
        val c = cs(i)
        if (c.row >= r0 && c.row <= r1 && c.col >= c0 && c.col <= c1) n += 1
        i += 1
      }
      n
    } else {
      var n = 0
      var r = r0
      while (r <= r1) {
        var c = c0
        while (c <= c1) { if (contains(r, c)) n += 1; c += 1 }
        r += 1
      }
      n
    }
  }

  /** Any non-empty cell in the rectangle? */
  def anyIn(r0: Int, r1: Int, c0: Int, c1: Int): Boolean = {
    var r = r0
    while (r <= r1) {
      var c = c0
      while (c <= c1) { if (contains(r, c)) return true; c += 1 }
      r += 1
    }
    false
  }
}

object CellGrid {
  /** Max dense-backing area: beyond this the flat array itself becomes the
    * allocation (and sparse-grid waste); fall back to the hash map.
    */
  private[grid] val MaxDenseArea = 1 << 16

  /** Grid with pre-declared bounds: cells live in a flat row-major array —
    * O(1) exact random access with no hash probes or growth copies, and
    * already-sorted traversal. A cell outside the bounds (ragged input)
    * migrates the grid to the sparse map transparently; bounds beyond
    * [[MaxDenseArea]] use the map from the start.
    */
  def dense(rows: Int, cols: Int): CellGrid =
    if (rows > 0 && cols > 0 && rows.toLong * cols <= MaxDenseArea)
      new CellGrid(8, rows, cols)
    else new CellGrid()
}

