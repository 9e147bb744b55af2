package graft.core.html

import graft.core.detect.GridKind
import graft.core.grid.{Cell, CellGrid}

/** Delimiter detection for embedded plain-text regions, porting the
  * reference's enhanced scoring (reference: readers/text_reader.py:161-301)
  * and the delimiter→format mapping of the text content analyzer
  * (reference: utils/file_magic.py:484-585).
  */
object DelimitedText {

  val Delimiters: Seq[Char] = Seq('\t', ',', '|', ';', ' ')

  // precompiled: String.split(regex) compiles a Pattern per call for
  // multi-char patterns — a per-line cost on the pre-region hot path
  private val WsRe = java.util.regex.Pattern.compile("\\s+")

  /** `line.split(delim.toString, -1)` for a literal char without the
    * per-call Pattern.compile (keeps trailing empty fields).
    */
  private[graft] def splitChar(line: String, delimiter: Char): Array[String] = {
    var parts = 1
    var i = line.indexOf(delimiter)
    while (i >= 0) { parts += 1; i = line.indexOf(delimiter, i + 1) }
    val out = new Array[String](parts)
    var start = 0
    var k = 0
    i = line.indexOf(delimiter)
    while (i >= 0) {
      out(k) = line.substring(start, i)
      k += 1
      start = i + 1
      i = line.indexOf(delimiter, start)
    }
    out(k) = line.substring(start)
    out
  }

  /** reference: text_reader.py:242-301 (_score_delimiter_enhanced). */
  def scoreDelimiterEnhanced(lines: Seq[String], delimiter: Char): Double = {
    if (lines.isEmpty) return 0.0
    val columnCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var validLines = 0
    lines.foreach { line =>
      if (line.nonEmpty && line.trim.nonEmpty) {
        val count =
          if (delimiter == ' ') WsRe.split(line).count(_.trim.nonEmpty)
          else line.count(_ == delimiter) + 1
        if (count > 1) {
          columnCounts += count
          validLines += 1
        }
      }
    }
    if (columnCounts.isEmpty || validLines < 2) return 0.0
    val unique = columnCounts.distinct
    if (unique.size == 1) {
      unique.head * validLines * 0.1
    } else if (unique.size <= 5) {
      val avg = columnCounts.sum.toDouble / columnCounts.size
      if (avg >= 5) {
        var base = avg * validLines * 0.08
        val highColumnLines = columnCounts.count(_ >= 10)
        if (highColumnLines >= validLines * 0.5) base *= 1.2
        base
      } else {
        val mostCommon = columnCounts.groupBy(identity).maxBy(kv => (kv._2.size, -kv._1))._1
        // Python max(set(...), key=count) ties resolve by set order; use the
        // most frequent count with the smallest value as a stable stand-in
        val consistencyRatio = columnCounts.count(_ == mostCommon).toDouble / columnCounts.size
        val bonus = if (consistencyRatio >= 0.6) 1.0 else consistencyRatio
        (avg * validLines * 0.1) * bonus
      }
    } else {
      if (validLines >= 2 && columnCounts.sum.toDouble / columnCounts.size >= 10) 1.0 else 0.0
    }
  }

  /** Best delimiter + score over the first 15 lines (long lines truncated at
    * 2000 chars, reference: text_reader.py:161-216).
    */
  def detectFormat(text: String): Option[(Char, Double)] = {
    val sampleLines = text.linesIterator.take(15)
      .map(l => (if (l.length > 2000) l.substring(0, 2000) else l).trim)
      .toVector
    if (sampleLines.isEmpty) return None
    // stable best: first delimiter in canonical order wins ties (tab first,
    // matching the reference's dict-order max)
    var best: Char = '\t'
    var bestScore = -1.0
    Delimiters.foreach { d =>
      val s = scoreDelimiterEnhanced(sampleLines, d)
      if (s > bestScore) { best = d; bestScore = s }
    }
    if (bestScore >= 1.5) Some((best, bestScore)) else None
  }

  /** Manual delimiter detection by per-line count consistency
    * (reference: readers/csv_reader.py:187-231 — the fallback when
    * csv.Sniffer fails): score = consistent_lines × consistent_count,
    * candidates , ; \t | : in that priority for ties.
    */
  def detectDelimiterManual(sample: String, defaultDelim: Char = ','): Char = {
    val candidates = Seq(',', ';', '\t', '|', ':')
    val lines = sample.split("\n", -1).take(10)
    var best = defaultDelim
    var bestScore = 0
    candidates.foreach { d =>
      var consistentCount = 0
      var consistentLines = 0
      var first = true
      lines.foreach { line =>
        if (line.trim.nonEmpty) {
          val count = line.count(_ == d)
          if (count > 0) {
            if (first) { consistentCount = count; consistentLines = 1; first = false }
            else if (consistentCount == count) consistentLines += 1
          }
        }
      }
      val score = consistentLines * consistentCount
      if (consistentCount > 0 && score > bestScore) { best = d; bestScore = score }
    }
    best
  }

  /** 1M-row safety cap (reference: csv_reader.py:252-255). */
  val MaxRows = 1000000

  /** Allocation-free line count ('\n' count + 1), capped at MaxRows + 1. */
  private def countLines(text: String): Int = {
    var n = 1
    var i = 0
    while (i < text.length && n <= MaxRows) {
      if (text.charAt(i) == '\n') n += 1
      i += 1
    }
    n
  }

  /** Parse delimited text to a grid.
    *
    * The grid kind steers the downstream cascade the way the reference's
    * FileType does: tab → TSV (typed cells, structured-text detection),
    * comma/pipe/semicolon → CSV (typed cells, island detection), space →
    * TXT (string cells, structured-text detection).
    */
  def parse(text: String, delimiter: Char): (CellGrid, GridKind) = {
    var g: CellGrid = null
    val infer = delimiter != ' '
    val res = new graft.core.grid.TypeInfer.Res // reused across cells (tuple-free)
    var r = 0
    text.linesIterator.takeWhile(_ => r <= MaxRows).foreach { line =>
      if (line.nonEmpty) { // reference csv path skips empty rows only implicitly
        val parts: Array[String] =
          if (delimiter == ' ') WsRe.split(line).filter(_.trim.nonEmpty)
          else splitQuoted(line, delimiter)
        // bounds are knowable up front here (line count × first row width):
        // dense flat backing — no hash probes, no growth copies; ragged
        // wider rows migrate to the map inside CellGrid. Wait for the first
        // row that actually has cells (a zero-part first line would forfeit
        // the dense backing for the whole document via dense(n, 0))
        if (g == null && parts.nonEmpty) g = CellGrid.dense(countLines(text), parts.length)
        var c = 0
        while (c < parts.length) {
          val v = parts(c)
          if (v != null && v.trim.nonEmpty) {
            g.put(if (infer) Cell.inferred(v, r, c, res) else Cell.str(v.trim, r, c))
          }
          c += 1
        }
        if (parts.nonEmpty) r += 1
      } else r += 1
    }
    if (g == null) g = new CellGrid
    val kind = delimiter match {
      case '\t' | ' ' => GridKind.DelimitedText
      case _ => GridKind.Csv
    }
    (g, kind)
  }

  /** CSV-style split honoring double quotes (minimal dialect: quotes wrap a
    * field, doubled quote escapes).
    */
  def splitQuoted(line: String, delimiter: Char): Array[String] = {
    if (line.indexOf('"') < 0) return splitChar(line, delimiter)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQuotes = false
    var i = 0
    val n = line.length
    while (i < n) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < n && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQuotes = false
        } else sb.append(c)
      } else {
        if (c == '"') inQuotes = true
        else if (c == delimiter) { out += sb.toString; sb.clear() }
        else sb.append(c)
      }
      i += 1
    }
    out += sb.toString
    out.toArray
  }
}
