package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.{PageGen, Pipeline, StreamingPipeline}

/** Streaming variant: incremental file arrival → same kernel → parquet
  * sink; restart continues from the checkpoint without reprocessing.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("streaming extraction drains landed files and resumes incrementally") {
    val inputDir = Files.createTempDirectory("stream_in").toString
    val outputDir = Files.createTempDirectory("stream_out").toString
    val checkpointDir = Files.createTempDirectory("stream_ckpt").toString

    val pages = PageGen.pages(spark, sfDir).cache()
    // land the first half
    pages.filter(_.url.hashCode % 2 == 0).write.mode("append").parquet(inputDir)
    val q1 = StreamingPipeline.run(spark, inputDir, outputDir, checkpointDir,
      availableNow = true)
    q1.awaitTermination(120000)
    val afterFirst = spark.read.parquet(outputDir).count()
    assert(afterFirst > 0)

    // land the second half; a restarted query must process ONLY the new files
    pages.filter(_.url.hashCode % 2 != 0).write.mode("append").parquet(inputDir)
    val q2 = StreamingPipeline.run(spark, inputDir, outputDir, checkpointDir,
      availableNow = true)
    q2.awaitTermination(120000)

    val streamed = spark.read.parquet(outputDir)
      .select("url", "text_sha256").orderBy("url").collect().map(_.toString).toVector
    val batch = Pipeline.extract(spark, pages)
      .select("url", "text_sha256").orderBy("url").collect().map(_.toString).toVector
    assert(streamed.size == 500, s"expected 500 rows, got ${streamed.size} (no reprocessing)")
    assert(streamed == batch, "streaming output must equal the batch pipeline byte-for-byte")
    pages.unpersist()
  }
}
