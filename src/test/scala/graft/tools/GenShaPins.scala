package graft.tools
import java.nio.file.{Files, Paths}
import graft.core.extract.Extractor
/** Regenerates the per-fixture canonical-text SHA pins. Run ONLY when the
  * text contract changes deliberately; commit the diff with an explanation.
  */
object GenShaPins {
  val boilerplate: String =
    """<html><head><title>t</title></head><body>
      |<nav><a href="/a">aaaa</a> <a href="/b">bbbb</a> <a href="/c">cccc</a></nav>
      |<p>This paragraph is long enough to be kept by the block classifier.</p>
      |%s
      |<footer><a href="/tos">terms of service</a></footer>
      |</body></html>""".stripMargin
  def main(args: Array[String]): Unit = {
    val entries = graft.FixtureLoader.fixtures.map { fix =>
      val html = boilerplate.format(graft.FixtureLoader.renderHtml(fix))
      val res = Extractor.extractHtml(html.getBytes("UTF-8"))
      s""" "${fix.name}": "${res.sha256}""""
    }
    Files.writeString(Paths.get("src/test/resources/golden/text_sha_pins.json"),
      entries.mkString("{\n", ",\n", "\n}\n"))
    println(s"wrote ${entries.size} sha pins")
  }
}
