package graft.core.html

import scala.collection.mutable

/** Minimal streaming HTML tokenizer: start/end tags with attributes, text,
  * comments. Single pass, no DOM allocation beyond the event; the page
  * parser consumes events and keeps only what it needs. Entity decoding for
  * the common named entities plus numeric references.
  */
object HtmlTokenizer {

  sealed trait Tok
  final case class StartTag(name: String, attrs: Map[String, String], selfClosing: Boolean)
      extends Tok
  final case class EndTag(name: String) extends Tok
  final case class Text(content: String) extends Tok

  private val RawTextTags = Set("script", "style", "noscript", "textarea")

  def tokenize(html: String, out: Tok => Unit): Unit = {
    val n = html.length
    var i = 0
    val text = new StringBuilder

    def flushText(): Unit = {
      if (text.nonEmpty) {
        out(Text(decodeEntities(text.toString)))
        text.clear()
      }
    }

    while (i < n) {
      val ch = html.charAt(i)
      if (ch == '<' && i + 1 < n) {
        val next = html.charAt(i + 1)
        if (next == '!') {
          flushText()
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else {
            val end = html.indexOf('>', i)
            i = if (end < 0) n else end + 1
          }
        } else if (next == '?') {
          flushText()
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else if (next == '/' ) {
          flushText()
          val end = html.indexOf('>', i)
          if (end < 0) { i = n }
          else {
            val name = html.substring(i + 2, end).trim.toLowerCase
            out(EndTag(name))
            i = end + 1
          }
        } else if (next.isLetter) {
          flushText()
          val (tag, after) = parseTag(html, i)
          out(tag)
          i = after
          // raw-text elements: skip to the matching close tag verbatim
          if (!tag.selfClosing && RawTextTags.contains(tag.name)) {
            val close = "</" + tag.name
            val idx = indexOfIgnoreCase(html, close, i)
            if (idx < 0) i = n
            else {
              val end = html.indexOf('>', idx)
              out(EndTag(tag.name))
              i = if (end < 0) n else end + 1
            }
          }
        } else {
          text.append(ch)
          i += 1
        }
      } else {
        text.append(ch)
        i += 1
      }
    }
    flushText()
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val nl = needle.length
    var i = from
    val max = hay.length - nl
    while (i <= max) {
      if (hay.regionMatches(true, i, needle, 0, nl)) return i
      i += 1
    }
    -1
  }

  /** Parse a start tag beginning at `start` (position of '<'). Returns the
    * token and the index after '>'.
    */
  private def parseTag(html: String, start: Int): (StartTag, Int) = {
    val n = html.length
    var i = start + 1
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    val name = internTagName(html, nameStart, i)
    // fast path: attribute-less tag (the overwhelmingly common <td>/<tr>)
    var attrs: mutable.Map[String, String] = null
    var selfClosing = false
    var done = false
    while (i < n && !done) {
      val c = html.charAt(i)
      if (c == '>') { done = true; i += 1 }
      else if (c == '/' && i + 1 < n && html.charAt(i + 1) == '>') {
        selfClosing = true; done = true; i += 2
      } else if (c.isWhitespace) i += 1
      else if (c == '/') i += 1 // stray slash not followed by '>': skip (malformed markup)
      else {
        if (attrs == null) attrs = mutable.Map.empty[String, String]
        // attribute
        val aStart = i
        while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '=' &&
          html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
        val aName = html.substring(aStart, i).toLowerCase
        while (i < n && html.charAt(i).isWhitespace) i += 1
        var aVal = ""
        if (i < n && html.charAt(i) == '=') {
          i += 1
          while (i < n && html.charAt(i).isWhitespace) i += 1
          if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i)
            i += 1
            val vStart = i
            while (i < n && html.charAt(i) != q) i += 1
            aVal = html.substring(vStart, i)
            if (i < n) i += 1
          } else {
            val vStart = i
            while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
            aVal = html.substring(vStart, i)
          }
        }
        if (aName.nonEmpty) attrs(aName) = decodeEntities(aVal)
      }
    }
    (StartTag(name, if (attrs == null) EmptyAttrs else attrs.toMap, selfClosing), i)
  }

  private val EmptyAttrs: Map[String, String] = Map.empty

  private val CommonTags: Array[String] = Array("td", "tr", "th", "table", "p", "div",
    "a", "b", "i", "li", "ul", "ol", "span", "pre", "nav", "h1", "h2", "h3", "h4",
    "h5", "h6", "br", "em", "strong", "header", "footer", "main", "body", "html",
    "head", "title", "section", "article", "aside", "form", "img", "script",
    "style", "meta", "link")

  /** Return the canonical lowercase tag-name string without allocating for
    * the common tags (a page has hundreds of td/tr tags).
    */
  private def internTagName(html: String, from: Int, until: Int): String = {
    val len = until - from
    var t = 0
    while (t < CommonTags.length) {
      val cand = CommonTags(t)
      if (cand.length == len) {
        var i = 0
        var ok = true
        while (ok && i < len) {
          val c = html.charAt(from + i)
          val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
          if (lc != cand.charAt(i)) ok = false
          i += 1
        }
        if (ok) return cand
      }
      t += 1
    }
    html.substring(from, until).toLowerCase
  }

  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "rsquo" -> "’", "lsquo" -> "‘",
    "rdquo" -> "”", "ldquo" -> "“", "times" -> "×", "middot" -> "·"
  )

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try {
              sb.appendAll(Character.toChars(Integer.parseInt(body.substring(2), 16)))
              i = semi + 1
            } catch { case _: Exception => sb.append(c); i += 1 }
          } else if (body.startsWith("#")) {
            try {
              sb.appendAll(Character.toChars(Integer.parseInt(body.substring(1))))
              i = semi + 1
            } catch { case _: Exception => sb.append(c); i += 1 }
          } else Named.get(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
