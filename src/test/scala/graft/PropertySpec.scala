package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.detect.{Cascade, GridKind, IslandDetector}
import graft.core.grid.{A1, Cell, CellGrid, PyFloat}
import graft.core.html.{HtmlTokenizer, PageParser}

/** Property tests (SURVEY.md §5.2.3): island partition covers all cells,
  * near-A1-translation behaviour, serialization round trips, tokenizer
  * robustness on arbitrary input.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a scalacheck property under ScalaTest (no scalatestplus bridge in
    * the offline cache).
    */
  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(result.passed, result.status.toString)
  }

  private val cellGen: Gen[(Int, Int)] = for {
    r <- Gen.choose(0, 30)
    c <- Gen.choose(0, 20)
  } yield (r, c)

  private def gridOf(coords: Seq[(Int, Int)]): CellGrid = {
    val g = new CellGrid
    coords.foreach { case (r, c) => g.put(Cell.str(s"v$r-$c", r, c)) }
    g
  }

  test("Css.pxValue scanner == the reference regex (leftmost match)") {
    val pxRegex = "([0-9]+(?:\\.[0-9]+)?)px".r
    def oracle(v: String): Option[Double] =
      pxRegex.findFirstMatchIn(v.toLowerCase).map(_.group(1).toDouble)
    val styleGen = Gen.listOf(Gen.oneOf("1", "2.5", "px", "PX", ".", "0", "12", "3.",
      " ", "solid", "p", "x", "black", "11px", "1.2.3px")).map(_.mkString)
    check(Prop.forAll(styleGen) { v =>
      PageParser.Css.pxValue(v) == oracle(v)
    })
  }

  test("islands partition the non-empty cells (no cell lost, no overlap)") {
    check(Prop.forAll(Gen.listOfN(60, cellGen)) { coords =>
      val g = gridOf(coords.distinct)
      val det = new IslandDetector(adaptiveThresholds = false, minIslandSize = 1,
        useFormattingBoundaries = false, emptyRowTolerance = 0)
      val islands = det.detectIslands(g)
      val total = islands.map(_.cells.size).sum
      // merge steps can union islands but never drop or duplicate cells
      total == g.size
    })
  }

  test("island bounds always contain their cells") {
    check(Prop.forAll(Gen.listOfN(40, cellGen)) { coords =>
      val g = gridOf(coords.distinct)
      val det = new IslandDetector(adaptiveThresholds = false, minIslandSize = 1)
      det.detectIslands(g).forall { isl =>
        var ok = true
        isl.cells.foreach { k =>
          val r = (k >> 32).toInt
          val c = k.toInt
          if (r < isl.minRow || r > isl.maxRow || c < isl.minCol || c > isl.maxCol) ok = false
        }
        ok
      }
    })
  }

  test("A1 codec round-trips arbitrary coordinates") {
    check(Prop.forAll(Gen.choose(0, 100000), Gen.choose(0, 20000)) { (r, c) =>
      A1.cellToIndices(s"${A1.colLetter(c)}${r + 1}") == ((r, c))
    })
  }

  test("PyFloat repr round-trips doubles") {
    check(Prop.forAll(Gen.choose(-1e12, 1e12)) { d =>
      java.lang.Double.parseDouble(PyFloat.repr(d)) == d
    })
    check(Prop.forAll(Gen.choose(0.0, 1.0)) { d =>
      java.lang.Double.parseDouble(PyFloat.repr(d)) == d
    })
  }

  test("tokenizer never throws on arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      var count = 0
      HtmlTokenizer.tokenize(s, _ => count += 1)
      count >= 0
    })
    check(Prop.forAll(Gen.listOf(Gen.oneOf("<table>", "<tr>", "</td>", "<b", "text", "&amp;",
      "<!--", "-->", "\"", "<td colspan='2'>", "</pre>", "<a href=x>"))) { parts =>
      val res = graft.core.extract.Extractor.extractHtml(parts.mkString.getBytes("UTF-8"))
      res.sha256.length == 64
    })
  }

  test("detection output is invariant to cell insertion order") {
    check(Prop.forAll(Gen.listOfN(50, cellGen)) { coords =>
      val distinct = coords.distinct
      val a = Cascade.detect(gridOf(distinct), GridKind.Formatted)
      val b = Cascade.detect(gridOf(scala.util.Random.shuffle(distinct)), GridKind.Formatted)
      a.tables.map(t => (t.span, t.confidence, t.headers)) ==
        b.tables.map(t => (t.span, t.confidence, t.headers))
    })
  }

  test("type-inference canonical shortcuts equal the full Python-repr path") {
    import graft.core.grid.TypeInfer
    // decimal strings across the shortcut boundary (sig digits, zeros)
    val decGen = for {
      intPart <- Gen.choose(0L, 99999999L)
      fracDigits <- Gen.choose(1, 9)
      frac <- Gen.choose(0L, math.pow(10, fracDigits).toLong - 1)
      neg <- Gen.oneOf("", "-")
    } yield s"$neg$intPart.${s"%0${fracDigits}d".format(frac)}"
    check(Prop.forAll(decGen) { s =>
      val (v, dt) = TypeInfer.infer(s)
      val d = java.lang.Double.parseDouble(s.replace(",", ""))
      dt == "number" && v == PyFloat.repr(d)
    })
    val intGen = Gen.choose(Long.MinValue + 1, Long.MaxValue).map(_.toString)
    check(Prop.forAll(intGen) { s =>
      val (v, dt) = TypeInfer.infer(s)
      dt == "number" && v == java.lang.Long.parseLong(s).toString
    })
  }

  test("Encoding.decode is total on arbitrary byte payloads") {
    val bytesGen = Gen.choose(0, 512).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Int.MinValue, Int.MaxValue).map(_.toByte)))
    check(Prop.forAll(bytesGen) { bs =>
      val arr = bs.toArray
      val decoded = graft.core.html.Encoding.decode(arr) // must never throw
      val res = graft.core.html.Encoding.detect(arr)
      decoded != null && res.encoding.nonEmpty
    })
  }

  test("normalizeWs is idempotent") {
    check(Prop.forAll(Gen.asciiStr) { s =>
      val once = PageParser.normalizeWs(s)
      PageParser.normalizeWs(once) == once
    })
  }
}
