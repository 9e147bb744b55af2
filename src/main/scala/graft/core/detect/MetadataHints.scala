package graft.core.detect

import graft.core.html.RegionMeta

/** One author-declared table hint (source, display name, confidence). */
final case class TableHint(source: String, name: String, confidence: Double)

/** HTML analogue of the reference's Excel metadata → detection-hint
  * conversion (reference: detectors/excel_metadata_extractor.py:292-344).
  * Like the reference's detector, this is a standalone hint surface — the
  * cascade itself never consumes it — with the same three-tier confidence
  * ladder:
  *
  *   - `<caption>` text ↔ ListObject display names: author-declared table
  *     identity, confidence 0.95 (excel_metadata_extractor.py:310)
  *   - `summary=` attribute ↔ named ranges: descriptive but not always a
  *     table name, confidence 0.7 (:328)
  *   - semantic id/class tokens ↔ print areas: "just hints",
  *     confidence 0.5 (:341)
  */
object MetadataHints {

  /** id/class tokens that suggest a data table (the `_is_likely_data_range`
    * analogue: cheap syntactic likelihood, not semantics).
    */
  private val SemanticTokens = Set(
    "data", "table", "datatable", "grid", "results", "result", "report",
    "stats", "statistics", "listing", "list", "ranking", "scores", "pricing")

  def hints(meta: RegionMeta): Vector[TableHint] = {
    val out = Vector.newBuilder[TableHint]
    if (meta.caption.nonEmpty)
      out += TableHint("caption", meta.caption, 0.95)
    if (meta.summary.nonEmpty)
      out += TableHint("summary", meta.summary, 0.7)
    val semantic = (tokens(meta.idAttr) ++ tokens(meta.classAttr))
      .filter(SemanticTokens.contains)
    if (semantic.nonEmpty)
      out += TableHint("semantic_class", semantic.distinct.sorted.mkString(" "), 0.5)
    out.result()
  }

  private def tokens(attr: String): Vector[String] =
    if (attr.isEmpty) Vector.empty
    else attr.toLowerCase.split("[^a-z0-9]+").iterator.filter(_.nonEmpty).toVector
}
