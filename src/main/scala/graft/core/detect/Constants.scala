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

/** Detection-time configuration (reference: config.py + detection.py:36-82). */
final case class DetectConfig(
    confidenceThreshold: Double = 0.6,
    adaptiveThresholds: Boolean = true,
    minTablePercentage: Double = 0.005,
    preferLargeTables: Boolean = true,
    emptyRowTolerance: Int = 1,
    useBorderDetection: Boolean = true,
    maxTablesPerSheet: Int = 50
) extends Serializable
