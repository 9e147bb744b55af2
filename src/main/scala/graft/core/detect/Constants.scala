package graft.core.detect

/** Detection thresholds copied verbatim from the reference so confidence
  * arithmetic is bit-identical (reference: src/gridgulp/core/constants.py).
  */
object IslandConst {
  val MinCellsGood = 20
  val MinCellsMedium = 10
  val MinCellsSmall = 4

  val DensityHigh = 0.8
  val DensityMedium = 0.6
  val DensityLow = 0.3

  val AspectRatioMin = 0.1
  val AspectRatioMax = 10.0

  val BaseConfidence = 0.5

  val ColumnConsistencyThreshold = 0.8
  val MinEmptyRowsToSplit = 1
  val DefaultMaxGap = 1
  val TextFileMaxGap = 0
  val ExcelFileMaxGap = 1

  val RelativeSizeLarge = 0.05
  val RelativeSizeMedium = 0.01
  val RelativeSizeSmall = 0.005
  val RelativeSizeTiny = 0.001

  val BorderWidth = 2
  val BorderCellThreshold = 0.3
}

/** reference: constants.py:186-228 (FormattingDetectionConstants). */
object FmtConst {
  val HeaderBoldThreshold = 0.7
  val BackgroundChangeThreshold = 0.3
  val BorderConsistencyThreshold = 0.8

  val NoBorders = "none"
  val AllBorders = "all"
  val OuterOnly = "outer"
  val HorizontalOnly = "horizontal"
  val VerticalOnly = "vertical"
  val MixedBorders = "mixed"
}

/** reference: constants.py:230-264 (Keywords). */
object Keywords {
  val Subtotal = Vector("subtotal", "sub-total")
  val GrandTotal = Vector("grand total", "total", "sum")
  val Section = Vector("section", "category", "group")
  val HierarchicalSubtotal =
    Vector("total", "subtotal", "sum", "sub-total", "grand total", "net", "gross", "overall")
}

/** Detection-time configuration (reference: config.py:8-142 +
  * detection.py:36-82). The per-run knobs of the reference's Config that
  * are reachable from its detection path are all represented; detector
  * CONSTANTS (IslandConst etc.) stay frozen so confidence arithmetic is
  * bit-identical to the reference.
  */
final case class DetectConfig(
    confidenceThreshold: Double = 0.6,
    adaptiveThresholds: Boolean = true,
    minTablePercentage: Double = 0.005,
    preferLargeTables: Boolean = true,
    emptyRowTolerance: Int = 1,
    useBorderDetection: Boolean = true,
    maxTablesPerSheet: Int = 50,
    // reference min_table_size (rows, cols) — consumed by the box-table
    // detector, exactly as in the reference (box_table_detector.py:22-29)
    minTableRows: Int = 2,
    minTableCols: Int = 2,
    // reference enable_simple_case_detection / enable_island_detection
    enableSimpleCase: Boolean = true,
    enableIslandDetection: Boolean = true,
    // reference max_file_size_mb analogue for byte payloads (P2 size cap)
    maxHtmlBytes: Int = 64 * 1024 * 1024,
    // run DataFrame extraction (header orientation/quality/shape) in the
    // kernel. OFF by default, mirroring the reference where detection and
    // DataFrameExtractor are separate stages and the published throughput
    // (1M+ cells/s) is detection-only; x_extract_tables turns it on.
    extractTables: Boolean = false
) extends Serializable

/** Env-var loading mirroring the reference's Config.from_env
  * (config.py:112-142), GRAFT_-prefixed. The `env` accessor is injectable
  * for tests; production callers use the default sys.env-backed one.
  */
object DetectConfig {
  def fromEnv(env: String => Option[String] = k => sys.env.get(k)): DetectConfig = {
    val d = DetectConfig()
    def bool(k: String, dflt: Boolean) = env(k).map(_.trim.toLowerCase == "true").getOrElse(dflt)
    def int(k: String, dflt: Int) = env(k).map(_.trim.toInt).getOrElse(dflt)
    def dbl(k: String, dflt: Double) = env(k).map(_.trim.toDouble).getOrElse(dflt)
    DetectConfig(
      confidenceThreshold = dbl("GRAFT_CONFIDENCE_THRESHOLD", d.confidenceThreshold),
      adaptiveThresholds = bool("GRAFT_ADAPTIVE_THRESHOLDS", d.adaptiveThresholds),
      minTablePercentage = dbl("GRAFT_MIN_TABLE_PERCENTAGE", d.minTablePercentage),
      preferLargeTables = bool("GRAFT_PREFER_LARGE_TABLES", d.preferLargeTables),
      emptyRowTolerance = int("GRAFT_EMPTY_ROW_TOLERANCE", d.emptyRowTolerance),
      useBorderDetection = bool("GRAFT_USE_BORDER_DETECTION", d.useBorderDetection),
      maxTablesPerSheet = int("GRAFT_MAX_TABLES_PER_SHEET", d.maxTablesPerSheet),
      minTableRows = int("GRAFT_MIN_TABLE_ROWS", d.minTableRows),
      minTableCols = int("GRAFT_MIN_TABLE_COLS", d.minTableCols),
      enableSimpleCase = bool("GRAFT_ENABLE_SIMPLE_CASE_DETECTION", d.enableSimpleCase),
      enableIslandDetection = bool("GRAFT_ENABLE_ISLAND_DETECTION", d.enableIslandDetection),
      // Long arithmetic + clamp: an env value >= 2048 MB would overflow Int
      // to a negative cap and silently mark the whole corpus parse_failed;
      // non-positive values (no sane meaning for a byte cap) keep the
      // default instead of failing every page
      maxHtmlBytes = {
        val mb = int("GRAFT_MAX_HTML_MB", d.maxHtmlBytes / (1024 * 1024))
        if (mb <= 0) d.maxHtmlBytes
        else math.min(mb.toLong * 1024L * 1024L, Int.MaxValue.toLong).toInt
      },
      extractTables = bool("GRAFT_EXTRACT_TABLES", d.extractTables)
    )
  }
}
