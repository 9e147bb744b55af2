package graft.core.html

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

final case class EncodingResult(encoding: String, confidence: Double, method: String,
    bomDetected: Boolean)

/** Byte-payload decoding replicating the reference's multi-tier detection
  * chain (reference: utils/file_magic.py:722-945):
  *
  *   1. BOM detection incl. UTF-32 (file_magic.py:754-771)
  *   2. strict UTF-8 validation — the JVM stand-in for the reference's
  *      high-confidence chardet tier (file_magic.py:735-745; no chardet on
  *      the JVM, and strict validation decides the same cases for web text)
  *   3. `<meta charset=…>` prescan for HTML payloads — a web-input addition
  *      the file-oriented reference has no analogue for (WHATWG HTML
  *      §13.2.3.2-style); deliberately ranked BELOW strict UTF-8 so a
  *      mislabeled but valid-UTF-8 page still decodes correctly
  *   4. UTF-16 null-alternation byte pattern (file_magic.py:879-902)
  *   5. the reference's 12-encoding fallback chain with strict-decode +
  *      printable-ratio validation (file_magic.py:904-945), with a
  *      null-byte guard on the UTF-16/32 entries standing in for chardet's
  *      probers (ASCII-heavy single-byte text decodes "successfully" as
  *      UTF-16 into printable CJK garble — real UTF-16 text of web pages
  *      has a large null-byte mass, single-byte text has none)
  *
  * Decode-time rule: a latin-1/iso-8859-1 verdict with any byte in
  * 0x80–0x9F upgrades to windows-1252 (the WHATWG encoding standard maps
  * the latin-1 label to windows-1252; those code points are C1 controls in
  * latin-1 and punctuation — smart quotes, em-dash — in cp1252).
  */
object Encoding {

  /** The reference's fallback chain order (file_magic.py:908-921) mapped to
    * JVM charset names. Entries missing from the JVM are skipped, mirroring
    * the reference's LookupError skip.
    */
  private val FallbackChain: Seq[(String, String)] = Seq(
    "utf-8" -> "UTF-8",
    "utf-16-le" -> "UTF-16LE",
    "utf-16-be" -> "UTF-16BE",
    "utf-16" -> "UTF-16LE", // Python utf-16 without BOM decodes little-endian
    "latin-1" -> "ISO-8859-1",
    "cp1252" -> "windows-1252",
    "iso-8859-1" -> "ISO-8859-1",
    "ascii" -> "US-ASCII",
    "cp437" -> "IBM437",
    "cp850" -> "IBM850",
    "utf-32-le" -> "UTF-32LE",
    "utf-32-be" -> "UTF-32BE"
  )

  def detect(bytes: Array[Byte]): EncodingResult = {
    // 1. BOM detection, most-specific first (file_magic.py:754-771)
    if (bytes.length >= 4 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte &&
        bytes(2) == 0 && bytes(3) == 0)
      return EncodingResult("utf-32-le", 1.0, "bom", bomDetected = true)
    if (bytes.length >= 4 && bytes(0) == 0 && bytes(1) == 0 &&
        bytes(2) == 0xFE.toByte && bytes(3) == 0xFF.toByte)
      return EncodingResult("utf-32-be", 1.0, "bom", bomDetected = true)
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte &&
        bytes(2) == 0xBF.toByte)
      return EncodingResult("utf-8-sig", 1.0, "bom", bomDetected = true)
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return EncodingResult("utf-16-le", 1.0, "bom", bomDetected = true)
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return EncodingResult("utf-16-be", 1.0, "bom", bomDetected = true)

    val sample = java.util.Arrays.copyOf(bytes, math.min(bytes.length, 1024))
    val sampleHasNul = sample.exists(_ == 0)

    // 2. strict utf-8 validation (chardet-tier stand-in). NUL bytes are
    // valid UTF-8 codepoints but never occur in real UTF-8 web text, while
    // UTF-16-encoded ASCII is wall-to-wall NULs — don't let a NUL-ridden
    // payload claim utf-8 here; the pattern tier below decides it.
    if (!sampleHasNul && strictDecodes(bytes, StandardCharsets.UTF_8))
      return EncodingResult("utf-8", 0.9, "validation", bomDetected = false)

    // 3. declared <meta charset=…>, validated before trusting
    if (!sampleHasNul) {
      metaCharset(bytes).foreach { cs =>
        if (validates(bytes, cs))
          return EncodingResult(cs.name(), 0.95, "meta", bomDetected = false)
      }
    }

    // 4. UTF-16 null-alternation pattern (file_magic.py:879-902)
    if (sample.length >= 4) {
      var evenNulls = 0
      var oddNulls = 0
      var i = 0
      while (i < sample.length) {
        if (sample(i) == 0) { if (i % 2 == 0) evenNulls += 1 else oddNulls += 1 }
        i += 1
      }
      val half = sample.length / 2.0
      if (oddNulls > half * 0.3 && evenNulls < half * 0.1)
        return EncodingResult("utf-16-le", 0.8, "byte_pattern", bomDetected = false)
      if (evenNulls > half * 0.3 && oddNulls < half * 0.1)
        return EncodingResult("utf-16-be", 0.8, "byte_pattern", bomDetected = false)
    }

    // 4.5. script prober for undeclared non-latin pages — the chardet
    // stand-in (the reference's tier 2). Only consulted when the high-bit
    // byte mass says the page is a non-latin script (so cp1252-style
    // accent sprinkling never reaches it).
    if (!sampleHasNul) {
      proberDetect(bytes).foreach(return _)
    }

    // 5. validated fallback chain (file_magic.py:904-945)
    val hasNulls = {
      var n = 0
      var i = 0
      while (i < sample.length) { if (sample(i) == 0) n += 1; i += 1 }
      sample.length > 0 && n * 20 >= sample.length // ≥5% null bytes
    }
    FallbackChain.foreach { case (label, jvmName) =>
      val wide = label.startsWith("utf-16") || label.startsWith("utf-32")
      if (!wide || hasNulls) {
        charsetOrNull(jvmName) match {
          case null => () // JVM lacks it — skip, like the reference's LookupError
          case cs =>
            if (validates(bytes, cs)) {
              val conf = if (label == "utf-8") 0.6 else 0.5
              return EncodingResult(label, conf, "fallback", bomDetected = false)
            }
        }
      }
    }

    // ultimate fallback: the reference returns utf-8@0.1 and decodes with
    // replacement; latin-1 is this engine's total-function equivalent — it
    // never fails and preserves the byte values 1:1
    EncodingResult("latin-1", 0.1, "fallback", bomDetected = false)
  }

  def decode(bytes: Array[Byte]): String = {
    // fast path: the dominant web page — no BOM, no NULs in the first 1 KB,
    // strictly valid UTF-8 — decodes ONCE. detect() would classify it
    // "utf-8" (validation tier) and decode() would re-decode the same
    // bytes; keeping the strict decoder's output is byte-identical since a
    // strict success has no malformed sequences for REPLACE to differ on.
    if (!startsWithBom(bytes) && !headHasNul(bytes)) {
      val fast = strictDecodeOrNull(bytes, StandardCharsets.UTF_8)
      if (fast != null) return fast
    }
    val res = detect(bytes)
    res.encoding match {
      case "utf-8-sig" =>
        new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8)
      case "utf-32-le" | "utf-32-be" =>
        val cs = charsetOrNull(if (res.encoding == "utf-32-le") "UTF-32LE" else "UTF-32BE")
        val skip = if (res.bomDetected) 4 else 0
        if (cs == null) new String(bytes, StandardCharsets.ISO_8859_1)
        else new String(bytes, skip, bytes.length - skip, cs)
      case "utf-16-le" =>
        val skip = if (res.bomDetected) 2 else 0
        new String(bytes, skip, bytes.length - skip, StandardCharsets.UTF_16LE)
      case "utf-16-be" =>
        val skip = if (res.bomDetected) 2 else 0
        new String(bytes, skip, bytes.length - skip, StandardCharsets.UTF_16BE)
      case "utf-8" => new String(bytes, StandardCharsets.UTF_8)
      case "latin-1" | "iso-8859-1" if hasC1Bytes(bytes) =>
        // WHATWG: the latin-1 label means windows-1252 on the web; bytes in
        // 0x80-0x9F are C1 controls in latin-1, punctuation in cp1252
        new String(bytes, charsetOrElse("windows-1252", StandardCharsets.ISO_8859_1))
      case "latin-1" | "iso-8859-1" => new String(bytes, StandardCharsets.ISO_8859_1)
      case other =>
        val jvm = FallbackChain.collectFirst { case (l, j) if l == other => j }.getOrElse(other)
        new String(bytes, charsetOrElse(jvm, StandardCharsets.ISO_8859_1))
    }
  }

  private def startsWithBom(b: Array[Byte]): Boolean =
    (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte && b(2) == 0xBF.toByte) ||
    (b.length >= 2 && ((b(0) == 0xFF.toByte && b(1) == 0xFE.toByte) ||
      (b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)))

  private def headHasNul(b: Array[Byte]): Boolean = {
    val n = math.min(b.length, 1024)
    var i = 0
    while (i < n) { if (b(i) == 0) return true; i += 1 }
    false
  }

  /** Strict decode that KEEPS the result (null on malformed input). */
  private def strictDecodeOrNull(bytes: Array[Byte], cs: Charset): String = {
    try {
      cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(ByteBuffer.wrap(bytes)).toString
    } catch { case _: CharacterCodingException => null }
  }

  def strictDecodes(bytes: Array[Byte], cs: Charset): Boolean = {
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      dec.decode(ByteBuffer.wrap(bytes))
      true
    } catch { case _: CharacterCodingException => false }
  }

  /** Strict decode + the reference's printable-ratio > 0.7 text check
    * (file_magic.py:923-936), with Python's isprintable/isspace semantics.
    */
  private def validates(bytes: Array[Byte], cs: Charset): Boolean = {
    val decoded =
      try {
        cs.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
          .decode(ByteBuffer.wrap(bytes))
      } catch { case _: CharacterCodingException => return false }
    val n = decoded.length()
    if (n == 0) return false
    var printable = 0
    var i = 0
    while (i < n) {
      if (pyPrintableOrSpace(decoded.charAt(i))) printable += 1
      i += 1
    }
    printable.toDouble / n > 0.7
  }

  /** Python's `c.isprintable() or c.isspace()` for a UTF-16 code unit:
    * whitespace (incl. \t\n\v\f\r, 0x1c-0x1f, NEL) passes; other control/
    * format/surrogate/private-use/unassigned fail; everything else passes.
    */
  private def pyPrintableOrSpace(c: Char): Boolean = {
    if (c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r' ||
        (c >= '\u001C' && c <= '\u001F') || c == '\u0085') return true
    Character.getType(c) match {
      case Character.CONTROL | Character.FORMAT | Character.SURROGATE |
           Character.PRIVATE_USE | Character.UNASSIGNED => false
      case _ => true
    }
  }

  private def hasC1Bytes(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (b >= 0x80 && b <= 0x9F) return true
      i += 1
    }
    false
  }

  private def charsetOrNull(name: String): Charset =
    try Charset.forName(name) catch { case _: Exception => null }

  private def charsetOrElse(name: String, dflt: Charset): Charset = {
    val cs = charsetOrNull(name)
    if (cs == null) dflt else cs
  }

  /** Chardet-analogue script prober for UNDECLARED non-latin pages
    * (reference tier 2, file_magic.py:773-832 — chardet with smart
    * confidence thresholds; no chardet exists on the JVM so this
    * re-implements its two core ideas):
    *
    *   1. structural validation — strict-decode under each candidate
    *      charset (multibyte lead/trail violations reject outright), then
    *      require ≥90 % of the decoded non-ASCII letters to land in the
    *      candidate's script block (CJK+kana for Japanese, CJK for GBK,
    *      Cyrillic for KOI8-R/cp1251);
    *   2. frequency discrimination — KOI8-R and cp1251 both decode Russian
    *      bytes into Cyrillic, just the wrong letters; the candidate whose
    *      decoded letters better match the most-common-Russian-letter set
    *      wins (chardet's language-model idea, reduced to one table).
    *
    * Guards: only consulted at ≥20 % high-bit byte mass (accented latin
    * text never qualifies), and the Japanese candidates additionally
    * require full-width kana/kanji content, so half-width-kana-shaped
    * byte art (e.g. cp437 box drawings, which alias the 0xA1-0xDF kana
    * range) cannot hijack.
    */
  @inline private def isCjk(c: Char): Boolean = {
    val cp = c.toInt
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
      (cp >= 0x3000 && cp <= 0x303F) || (cp >= 0xFF01 && cp <= 0xFF60)
  }

  @inline private def isKanaFull(c: Char): Boolean = c >= 0x3040 && c <= 0x30FF
  @inline private def isKanaHalf(c: Char): Boolean = c >= 0xFF61 && c <= 0xFF9F
  @inline private def isJapanese(c: Char): Boolean =
    isCjk(c) || isKanaFull(c) || isKanaHalf(c)
  @inline private def isCyrillic(c: Char): Boolean = c >= 0x0400 && c <= 0x04FF

  /** The most frequent Russian letters (both cases) -- enough to rank
    * KOI8-R against cp1251 on real text, and to reject non-Russian bytes
    * that merely decode into the Cyrillic block (12/66 letters ~ 0.18
    * by chance vs ~0.5+ on real Russian).
    */
  private val CommonRussian: Set[Char] = "\u043e\u0435\u0430\u0438\u043d\u0442\u0441\u0440\u0432\u043b\u043a\u043c\u041e\u0415\u0410\u0418\u041d\u0422\u0421\u0420\u0412\u041b\u041a\u041c".toSet

  private final case class ProbeScore(purity: Double, fullKanaFrac: Double, ruFreq: Double,
      distinctScript: Int)

  private def probeScore(bytes: Array[Byte], n: Int, jvmName: String,
      inScript: Char => Boolean): ProbeScore = {
    val cs = charsetOrNull(jvmName)
    if (cs == null) return ProbeScore(0.0, 0.0, 0.0, 0)
    val decoded =
      try {
        cs.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
          .decode(ByteBuffer.wrap(bytes, 0, n))
      } catch { case _: CharacterCodingException => return ProbeScore(0.0, 0.0, 0.0, 0) }
    var scriptHits = 0
    var nonAscii = 0
    var fullKana = 0
    var commonRu = 0
    var cyr = 0
    val distinct = new java.util.HashSet[Char]()
    var j = 0
    val len = decoded.length()
    while (j < len) {
      val c = decoded.charAt(j)
      if (c >= 0x80) {
        nonAscii += 1
        if (inScript(c)) { scriptHits += 1; if (distinct.size < 64) distinct.add(c) }
        if (isKanaFull(c)) fullKana += 1
        if (isCyrillic(c)) { cyr += 1; if (CommonRussian.contains(c)) commonRu += 1 }
      }
      j += 1
    }
    if (nonAscii == 0) ProbeScore(0.0, 0.0, 0.0, 0)
    else ProbeScore(scriptHits.toDouble / nonAscii, fullKana.toDouble / nonAscii,
      if (cyr > 0) commonRu.toDouble / cyr else 0.0, distinct.size)
  }

  /** Two-phase arbitration (see scaladoc above):
    *
    * Phase A, CJK multibyte: strict decode is strong structural evidence
    * (single-byte-script text has high bytes adjacent to ASCII spaces,
    * which are invalid multibyte trails). Japanese candidates must show
    * real full-width kana mass (>= 5% of non-ASCII chars) -- true Japanese
    * always does, Chinese-as-SJIS garble and kana-aliased byte art do not.
    *
    * Phase B, Cyrillic single-byte: these decode ANY bytes, so purity
    * alone proves nothing; require the common-Russian-letter share of the
    * decoded Cyrillic to clear 0.3 (chance ~ 0.18), and let the higher
    * share pick KOI8-R vs cp1251.
    */
  private def proberDetect(bytes: Array[Byte]): Option[EncodingResult] = {
    val n = math.min(bytes.length, 8192)
    if (n == 0) return None
    var high = 0
    var i = 0
    while (i < n) { if ((bytes(i) & 0xFF) >= 0x80) high += 1; i += 1 }
    if (high * 5 < n) return None // <20% high-bit mass: not a non-latin page

    // phase A: Japanese (kana-gated), then GBK
    val sjis = probeScore(bytes, n, "Shift_JIS", isJapanese)
    val eucjp = probeScore(bytes, n, "EUC-JP", isJapanese)
    val jp = Seq("shift_jis" -> sjis, "euc-jp" -> eucjp)
      .filter { case (_, sc) => sc.purity >= 0.9 && sc.fullKanaFrac >= 0.05 }
    if (jp.nonEmpty) {
      val (label, _) = jp.maxBy { case (_, sc) => (sc.purity, sc.fullKanaFrac) }
      return Some(EncodingResult(label, 0.85, "prober", bomDetected = false))
    }
    // real Chinese pages use dozens of distinct hanzi; repeated-byte art
    // decodes to one or two distinct chars
    val gbk = probeScore(bytes, n, "GBK", isCjk)
    if (gbk.purity >= 0.9 && gbk.distinctScript >= 8)
      return Some(EncodingResult("gbk", 0.85, "prober", bomDetected = false))

    // phase B: Cyrillic with a frequency floor
    val koi = probeScore(bytes, n, "KOI8-R", isCyrillic)
    val w1251 = probeScore(bytes, n, "windows-1251", isCyrillic)
    val cyr = Seq("koi8-r" -> koi, "cp1251" -> w1251)
      .filter { case (_, sc) => sc.purity >= 0.9 && sc.ruFreq >= 0.3 }
    if (cyr.nonEmpty) {
      val (label, _) = cyr.maxBy { case (_, sc) => sc.ruFreq }
      return Some(EncodingResult(label, 0.85, "prober", bomDetected = false))
    }
    None
  }

  /** Prescan the first 1024 bytes for `<meta … charset=…>` (WHATWG-style).
    * UTF-16/32 declarations are ignored (a readable ASCII meta tag proves
    * the document is NOT UTF-16/32 encoded).
    */
  private val MetaCharsetRe =
    """(?is)<meta[^>]*charset\s*=\s*["']?\s*([A-Za-z0-9._\-]+)""".r

  private[graft] def metaCharset(bytes: Array[Byte]): Option[Charset] = {
    val n = math.min(bytes.length, 1024)
    if (n == 0) return None
    val head = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
    MetaCharsetRe.findFirstMatchIn(head).flatMap { m =>
      val label = m.group(1).toLowerCase
      if (label.startsWith("utf-16") || label.startsWith("utf-32")) None
      else {
        val jvm = label match {
          case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" => "Shift_JIS"
          case "gb2312" | "gbk" => "GBK"
          case "latin-1" | "latin1" | "iso-8859-1" | "cp1252" | "windows-1252" =>
            "windows-1252" // WHATWG: one equivalence class
          case other => other
        }
        Option(charsetOrNull(jvm))
      }
    }
  }
}
