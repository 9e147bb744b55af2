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
  // java-regex \s (the WsRe split class): ASCII whitespace only — NOT
  // Character.isWhitespace
  @inline private def isWsSplitChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def parse(text: String, delimiter: Char): (CellGrid, GridKind) = {
    // SPAN-BACKED PARSE (round 5): cells reference [from, until) spans of
    // `text` itself instead of per-cell substrings — identity-rendered
    // cells (plain strings, canonical numbers, dates: the overwhelming
    // majority) allocate NO string at parse time; materialization is lazy
    // and the serializer appends straight from the span. Verdicts are
    // inferInto's exactly (inferSpan equivalence is property-pinned). The
    // quoted-CSV dialect (doubled-quote escapes change the field text)
    // falls back to the materializing path per line — quotes are rare in
    // crawl-embedded CSV and that path's semantics stay byte-identical.
    var g: CellGrid = null
    val res = new graft.core.grid.TypeInfer.Res // reused across cells (tuple-free)
    // one backing wrapper per document (a bare String cannot back spans —
    // see StrView); every span cell of this grid shares it
    val view = new graft.core.grid.StrView(text)
    var r = 0
    val n = text.length
    // reusable field-span buffer (starts/ends per line)
    var fFrom = new Array[Int](16)
    var fUntil = new Array[Int](16)
    @inline def grow(k: Int): Unit =
      if (k == fFrom.length) {
        fFrom = java.util.Arrays.copyOf(fFrom, k * 2)
        fUntil = java.util.Arrays.copyOf(fUntil, k * 2)
      }
    var lineStart = 0
    while (lineStart < n && r <= MaxRows) {
      // linesIterator semantics: terminators \n, \r\n, \r; no trailing
      // empty line after a final terminator
      var le = lineStart
      while (le < n && text.charAt(le) != '\n' && text.charAt(le) != '\r') le += 1

      if (le == lineStart) { // empty line: advance the row counter only
        r += 1
      } else if (delimiter == ' ') {
        // ≡ WsRe.split(line).filter(_.trim.nonEmpty): maximal non-\s runs,
        // kept only when String.trim leaves something; the cell value is
        // the trimmed run (Cell.str(v.trim)), raw == value
        var k = 0
        var i = lineStart
        while (i < le) {
          while (i < le && isWsSplitChar(text.charAt(i))) i += 1
          if (i < le) {
            val a = i
            while (i < le && !isWsSplitChar(text.charAt(i))) i += 1
            // String.trim semantics on the run (strips chars <= ' ')
            var ta = a
            var tb = i
            while (ta < tb && text.charAt(ta) <= ' ') ta += 1
            while (tb > ta && text.charAt(tb - 1) <= ' ') tb -= 1
            if (tb > ta) {
              grow(k)
              fFrom(k) = ta
              fUntil(k) = tb
              k += 1
            }
          }
        }
        if (k > 0) {
          if (g == null) g = CellGrid.dense(countLines(text), k)
          var c = 0
          while (c < k) {
            g.putSpanned(view, fFrom(c), fUntil(c), fFrom(c), fUntil(c),
              "string", r, c)
            c += 1
          }
          r += 1
        }
        // zero kept runs: no cells, and (matching the old parts.isEmpty
        // behavior) the row counter does NOT advance
      } else {
        // delimiter-char path: field spans between delimiter positions;
        // a quote anywhere on the line falls back to the quoted dialect
        var k = 0
        var hasQuote = false
        var start = lineStart
        var i = lineStart
        while (!hasQuote && i <= le) {
          if (i == le || text.charAt(i) == delimiter) {
            grow(k)
            fFrom(k) = start
            fUntil(k) = i
            k += 1
            start = i + 1
          } else if (text.charAt(i) == '"') hasQuote = true
          i += 1
        }
        if (hasQuote) {
          val parts = splitQuoted(text.substring(lineStart, le), delimiter)
          if (g == null && parts.nonEmpty) g = CellGrid.dense(countLines(text), parts.length)
          var c = 0
          while (c < parts.length) {
            val v = parts(c)
            if (v != null && v.trim.nonEmpty) g.put(Cell.inferred(v, r, c, res))
            c += 1
          }
        } else {
          if (g == null) g = CellGrid.dense(countLines(text), k)
          var c = 0
          while (c < k) {
            graft.core.grid.TypeInfer.inferSpan(text, fFrom(c), fUntil(c), res)
            if (res.dt != "empty") { // ≡ the old v.trim.nonEmpty guard
              if (res.identity)
                g.putSpanned(view, fFrom(c), fUntil(c), res.vFrom, res.vUntil,
                  res.dt, r, c)
              else
                g.putConverted(res.py, view, fFrom(c), fUntil(c), res.dt, r, c)
            }
            c += 1
          }
        }
        r += 1 // both delimiter-path variants always have >= 1 field
      }

      if (le < n) {
        lineStart =
          if (text.charAt(le) == '\r' && le + 1 < n && text.charAt(le + 1) == '\n') le + 2
          else le + 1
      } else lineStart = n
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
