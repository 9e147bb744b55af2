package graft

import java.nio.charset.{Charset, StandardCharsets}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.extract.Extractor
import graft.core.html.Encoding

/** The multi-tier encoding chain (reference: utils/file_magic.py:722-945):
  * fallback-chain coverage for single-byte codepages, the WHATWG cp1252
  * upgrade, declared meta charsets, and pattern-detected UTF-16.
  */
class EncodingSpec extends AnyFunSuite {

  test("undeclared cp1252 with smart punctuation decodes via the cp1252 upgrade") {
    val text = "He said “hello” — and that’s fine, café stuff."
    val bytes = text.getBytes(Charset.forName("windows-1252"))
    val res = Encoding.detect(bytes)
    assert(res.method == "fallback", s"got $res")
    assert(res.encoding == "latin-1") // chain verdict; C1 bytes upgrade at decode
    assert(Encoding.decode(bytes) == text)
  }

  test("declared shift_jis page decodes through the meta prescan") {
    val jp = "日本語のテキスト" // 日本語のテキスト
    val html = s"""<!DOCTYPE html><html><head><meta charset="shift_jis"></head>
      |<body><p>$jp desu.</p></body></html>""".stripMargin
    val bytes = html.getBytes(Charset.forName("Shift_JIS"))
    val res = Encoding.detect(bytes)
    assert(res.method == "meta", s"got $res")
    assert(Encoding.decode(bytes) == html)
  }

  test("declared koi8-r cyrillic decodes through the meta prescan") {
    val ru = "русский текст"
    val html = s"<html><head><meta charset=koi8-r></head><body><p>$ru</p></body></html>"
    val bytes = html.getBytes(Charset.forName("KOI8-R"))
    val res = Encoding.detect(bytes)
    assert(res.method == "meta", s"got $res")
    assert(Encoding.decode(bytes) == html)
  }

  test("a valid-UTF-8 page mislabeled cp1252 still decodes as UTF-8") {
    val html = "<html><head><meta charset=windows-1252></head><body>café — ok</body></html>"
    val bytes = html.getBytes(StandardCharsets.UTF_8)
    val res = Encoding.detect(bytes)
    assert(res.encoding == "utf-8" && res.method == "validation")
    assert(Encoding.decode(bytes) == html)
  }

  test("BOM-less UTF-16LE ASCII is caught by the null pattern, not claimed by utf-8") {
    val text = "<html><body><p>plain ascii utf-16 page</p></body></html>"
    val bytes = text.getBytes(StandardCharsets.UTF_16LE)
    val res = Encoding.detect(bytes)
    assert(res.encoding == "utf-16-le" && res.method == "byte_pattern", s"got $res")
    assert(Encoding.decode(bytes) == text)
  }

  test("cp437 box-drawing payload falls through latin-1 validation to cp437") {
    // box-drawing bytes 0xB3/0xC4/0xDA… are C1 controls in latin-1 (fails
    // the printable check when dense) but printable glyphs in cp437
    val bytes = Array.tabulate[Byte](64)(i => if (i % 2 == 0) 0xB3.toByte else 0x8E.toByte)
    val res = Encoding.detect(bytes)
    assert(res.method == "fallback")
    assert(res.encoding == "cp437" || res.encoding == "cp1252", s"got $res")
    Encoding.decode(bytes) // total function, must not throw
  }

  test("pure garbage still decodes via the ultimate fallback") {
    val bytes = Array.fill[Byte](64)(0x81.toByte)
    val decoded = Encoding.decode(bytes)
    assert(decoded.length > 0)
  }

  test("cp1252 page round-trips byte-identically through the full pipeline") {
    val html = "<html><body><p>She wrote “résumé” — done.</p></body></html>"
    val bytes = html.getBytes(Charset.forName("windows-1252"))
    val viaPipeline = Extractor.extractHtml(bytes)
    val viaUtf8 = Extractor.extractHtml(html.getBytes(StandardCharsets.UTF_8))
    assert(viaPipeline.text == viaUtf8.text, "same logical text, same extraction bytes")
    assert(viaPipeline.sha256 == viaUtf8.sha256)
    assert(viaPipeline.text.contains("“résumé”"))
  }

  test("script prober detects UNDECLARED shift_jis / euc-jp / gbk pages") {
    val jp = "<html><body><p>日本語のページです。今日は天気がいいですね。東京都内の情報。</p></body></html>"
    val sj = jp.getBytes(Charset.forName("Shift_JIS"))
    val rs = Encoding.detect(sj)
    assert(rs.method == "prober" && rs.encoding == "shift_jis", s"got $rs")
    assert(Encoding.decode(sj) == jp)
    val eu = jp.getBytes(Charset.forName("EUC-JP"))
    val re = Encoding.detect(eu)
    assert(re.method == "prober" && re.encoding == "euc-jp", s"got $re")
    assert(Encoding.decode(eu) == jp)
    val zh = "<html><body><p>中文网页内容测试，今天天气很好，数据处理分析结果。</p></body></html>"
    val gb = zh.getBytes(Charset.forName("GBK"))
    val rg = Encoding.detect(gb)
    assert(rg.method == "prober" && rg.encoding == "gbk", s"got $rg")
    assert(Encoding.decode(gb) == zh)
  }

  test("script prober separates undeclared koi8-r from cp1251 by letter frequency") {
    val ru = "<html><body><p>русский текст на странице. сегодня хорошая погода и новости дня." +
      " интересные статьи о науке и технике.</p></body></html>"
    val koi = ru.getBytes(Charset.forName("KOI8-R"))
    val rk = Encoding.detect(koi)
    assert(rk.method == "prober" && rk.encoding == "koi8-r", s"got $rk")
    assert(Encoding.decode(koi) == ru)
    val w1251 = ru.getBytes(Charset.forName("windows-1251"))
    val rw = Encoding.detect(w1251)
    assert(rw.method == "prober" && rw.encoding == "cp1251", s"got $rw")
    assert(Encoding.decode(w1251) == ru)
  }

  test("prober never fires on accent-sprinkled latin or kana-aliased byte art") {
    // cp1252 with light accents: high-bit mass far below 20%
    val fr = "<html><body><p>Le café était très agréable, déjà réservé.</p></body></html>"
    val r = Encoding.detect(fr.getBytes(Charset.forName("windows-1252")))
    assert(r.method != "prober", s"got $r")
    // cp437 box art aliases the half-width-kana range; no full-width content
    // → the Japanese candidates must decline (see cp437 test above)
    val bytes = Array.tabulate[Byte](64)(i => if (i % 2 == 0) 0xB3.toByte else 0x8E.toByte)
    assert(Encoding.detect(bytes).method == "fallback")
  }

  test("meta prescan parses label variants and rejects utf-16 labels") {
    def meta(s: String) = Encoding.metaCharset(s.getBytes(StandardCharsets.ISO_8859_1))
    assert(meta("<meta charset='UTF-8'>").map(_.name()) == Some("UTF-8"))
    assert(meta("<META HTTP-EQUIV=Content-Type CONTENT=\"text/html; charset=gb2312\">")
      .map(_.name()) == Some("GBK"))
    assert(meta("<meta charset=utf-16le>").isEmpty, "ASCII meta tag disproves utf-16")
    assert(meta("<p>no charset= here outside a meta tag</p>").isEmpty)
    assert(meta("<meta charset=not-a-real-charset>").isEmpty)
  }
}
