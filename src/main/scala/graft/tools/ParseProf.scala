package graft.tools

import graft.spark.PageGen

/** Poor-man's parse-phase profiler: times tokenization alone vs the full
  * parse (tokenize + grid build + type inference) vs decode, on the same
  * synthetic mix KernelBench uses. Prints PPROF lines.
  */
object ParseProf {
  def main(args: Array[String]): Unit = {
    val pages = (0L until 20000L).map { i =>
      PageGen.makePage(i, "The quick brown fox jumps over the lazy dog. " * 8, "en").html
    }.toArray

    def time(label: String)(f: => Unit): Unit = {
      // warm twice, measure thrice, report min
      f; f
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PPROF $label%-28s ${times.min}%6.3f s (${pages.length / times.min}%.0f docs/s)")
    }

    time("decode-only") {
      var i = 0
      while (i < pages.length) { graft.core.html.Encoding.decode(pages(i)); i += 1 }
    }
    val decoded = pages.map(graft.core.html.Encoding.decode)
    time("tokenize-only") {
      var i = 0
      while (i < decoded.length) {
        var n = 0
        graft.core.html.HtmlTokenizer.tokenize(decoded(i), _ => n += 1)
        i += 1
      }
    }
    time("parse (tok+grid+infer)") {
      var i = 0
      while (i < decoded.length) { graft.core.html.PageParser.parse(decoded(i)); i += 1 }
    }
    time("full extract") {
      var i = 0
      while (i < pages.length) { graft.core.extract.Extractor.extractHtml(pages(i)); i += 1 }
    }
  }
}
