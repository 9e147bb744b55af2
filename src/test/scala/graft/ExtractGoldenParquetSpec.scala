package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.GenExtractGoldens

/** The driver's DuckDB oracle for the x_extract_* surfaces reads the
  * committed golden parquet — this spec runs the same comparison inside
  * `sbt test`, so extraction drift fails HERE first (with a diff) instead
  * of surfacing as an opaque hash mismatch in the driver's round report.
  * Regenerate deliberately with `runMain graft.tools.GenExtractGoldens`.
  */
class ExtractGoldenParquetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  GenExtractGoldens.surfaces.foreach { name =>
    test(s"$name matches the committed sf0.01 golden parquet") {
      val fresh = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      val golden = spark.read.parquet(GenExtractGoldens.goldenFile(name))
      assert(fresh.columns.toSeq == golden.columns.toSeq, "schema drift")
      val f = fresh.collect().map(_.toString).sorted
      val g = golden.collect().map(_.toString).sorted
      assert(f.length == g.length, s"row count ${f.length} != golden ${g.length}")
      val firstDiff = f.zip(g).indexWhere { case (a, b) => a != b }
      assert(firstDiff == -1,
        s"first differing row #$firstDiff:\n  fresh : ${f.lift(firstDiff)}\n" +
          s"  golden: ${g.lift(firstDiff)}")
    }
  }
}
