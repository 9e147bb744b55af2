package graft.tools

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named queries into plans/r08/
  * as `<query>_<suffix>.txt` (the round-8 optimization evidence files).
  * Usage: runMain graft.tools.PlansR08 <suffix> [query names...]
  * (no names = every query). sf0.001 keeps the plan shape identical to
  * the bench SFs while planning in seconds.
  */
object PlansR08 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlansR08 <suffix> [query names...]")
    val suffix = args.head
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val outDir = Paths.get("/root/repo/plans/r08")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val out = new ByteArrayOutputStream()
      Console.withOut(new PrintStream(out)) { df.explain("formatted") }
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), out.toString)
      println(s"wrote plans/r08/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
