package graft.core.html

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

final case class EncodingResult(encoding: String, confidence: Double, method: String,
    bomDetected: Boolean)

/** Byte-payload decoding replicating the reference's detection chain shape
  * (reference: utils/file_magic.py:722-945): BOM first, then strict-decode
  * validation, then the UTF-16 null-alternation byte pattern, then a
  * fallback chain. (No chardet on the JVM; strict decode validation covers
  * the same decisions for the corpus encodings.)
  */
object Encoding {

  def detect(bytes: Array[Byte]): EncodingResult = {
    // 1. BOM detection (file_magic.py:754-771)
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte &&
        bytes(2) == 0xBF.toByte)
      return EncodingResult("utf-8-sig", 1.0, "bom", bomDetected = true)
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return EncodingResult("utf-16-le", 1.0, "bom", bomDetected = true)
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return EncodingResult("utf-16-be", 1.0, "bom", bomDetected = true)

    // 2. strict utf-8 validation (file_magic.py:847-877 decode-validation)
    if (strictDecodes(bytes, StandardCharsets.UTF_8))
      return EncodingResult("utf-8", 0.9, "validation", bomDetected = false)

    // 3. UTF-16 null-alternation pattern (file_magic.py:879-902)
    val sample = java.util.Arrays.copyOf(bytes, math.min(bytes.length, 1024))
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

    // 4. fallback chain (file_magic.py:904-945) — latin-1 always decodes
    EncodingResult("latin-1", 0.5, "fallback", bomDetected = false)
  }

  def decode(bytes: Array[Byte]): String = {
    val res = detect(bytes)
    res.encoding match {
      case "utf-8-sig" =>
        new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8)
      case "utf-16-le" =>
        val skip = if (res.bomDetected) 2 else 0
        new String(bytes, skip, bytes.length - skip, StandardCharsets.UTF_16LE)
      case "utf-16-be" =>
        val skip = if (res.bomDetected) 2 else 0
        new String(bytes, skip, bytes.length - skip, StandardCharsets.UTF_16BE)
      case "utf-8" => new String(bytes, StandardCharsets.UTF_8)
      case _ => new String(bytes, StandardCharsets.ISO_8859_1)
    }
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
}
