package graft.spark

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.detect.DetectConfig

/** Structured Streaming variant of the extraction pipeline.
  *
  * The reference is strictly batch (SURVEY.md §2.9) and the north rule's
  * resumability is satisfied by snapshot-granular batch (Snapshots.scala);
  * this streaming surface exists for continuously landing crawl data:
  * `readStream` over the input table's directory → the same per-row kernel
  * (stateless, so no watermark is needed) → parquet sink with exactly-once
  * file-sink semantics via the checkpoint log. Restart-safety comes from
  * the sink's checkpoint, complementing the batch snapshot shim.
  */
object StreamingPipeline {

  /** Stream pages from a directory of parquet files as they land. */
  def readPages(spark: SparkSession, inputDir: String, maxFilesPerTrigger: Int = 8)
      : Dataset[Page] = {
    import spark.implicits._
    spark.readStream
      .schema("url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .as[Page]
  }

  /** The same kernel, applied to a streaming Dataset (stateless map — the
    * plan stays a streaming-compatible MapPartitions).
    */
  def extractStream(pages: Dataset[Page], config: DetectConfig = DetectConfig())
      : Dataset[Extracted] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.map(p => Pipeline.extractOne(p, config, pid))
    }
  }

  /** Start the stream: parquet sink + checkpoint (exactly-once file sink).
    * availableNow=true drains what exists and stops (used by tests and
    * catch-up runs); otherwise runs continuously.
    */
  def run(spark: SparkSession, inputDir: String, outputDir: String, checkpointDir: String,
      config: DetectConfig = DetectConfig(), availableNow: Boolean = false): StreamingQuery = {
    val extracted = extractStream(readPages(spark, inputDir), config)
    val writer = extracted.writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
