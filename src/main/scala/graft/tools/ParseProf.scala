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

    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    def time(label: String)(f: => Unit): Unit = {
      // warm twice, measure thrice, report min time + alloc/doc
      f; f
      val tid = Thread.currentThread().getId
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      val perDoc = (tmx.getThreadAllocatedBytes(tid) - a0) / 3 / pages.length
      println(f"PPROF $label%-28s ${times.min}%6.3f s (${pages.length / times.min}%.0f docs/s) alloc/doc=$perDoc%d B")
    }

    time("decode-only") {
      var i = 0
      while (i < pages.length) { graft.core.html.Encoding.decode(pages(i)); i += 1 }
    }
    val decoded = pages.map(graft.core.html.Encoding.decode)
    time("tokenize-only") {
      var i = 0
      val sink = new graft.core.html.HtmlTokenizer.TokSink {
        var n = 0
        def onStartTag(name: String, attrs: Map[String, String], sc: Boolean): Unit = n += 1
        def onEndTag(name: String): Unit = n += 1
        def onText(src: String, from: Int, until: Int, hasAmp: Boolean): Unit = n += 1
      }
      while (i < decoded.length) {
        graft.core.html.HtmlTokenizer.tokenize(decoded(i), sink)
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

    // per-variant parse + detect allocation (variant = docId % 10; PageGen)
    val tid = Thread.currentThread().getId
    val names = Array("simple", "dense", "islands", "islands", "islands", "box",
      "pre-tab", "pre-comma", "plate96", "prose")
    val cfg = graft.core.detect.DetectConfig()
    (0 until 10).foreach { v =>
      val docs = (0 until 20000 by 10).map(b => decoded(b + v)).toArray
      val parsed = docs.map(graft.core.html.PageParser.parse) // also warms
      parsed.foreach(_.regions.foreach(r => graft.core.detect.Cascade.detect(r.grid, r.kind, cfg)))
      val a0 = tmx.getThreadAllocatedBytes(tid)
      var cells = 0L
      docs.foreach { d => graft.core.html.PageParser.parse(d).regions.foreach(r => cells += r.grid.size) }
      val aParse = tmx.getThreadAllocatedBytes(tid)
      parsed.foreach(_.regions.foreach(r => graft.core.detect.Cascade.detect(r.grid, r.kind, cfg)))
      val aDetect = tmx.getThreadAllocatedBytes(tid)
      val perP = (aParse - a0) / docs.length
      val perD = (aDetect - aParse) / docs.length
      println(f"PPROF variant=$v (${names(v)}%-9s) parse alloc/doc=$perP%6d B detect alloc/doc=$perD%6d B cells/doc=${cells / docs.length}%d")
    }
  }
}
