package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): `decodeStub` produces a deterministic fake decode so the
  * Spark-side contract — schema, batch shape, partitioning, null/error
  * isolation — is real and tested, and a real decoder drops in behind the
  * same signature.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      decode_ok: Boolean,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float] // fixed 16-dim stub embedding
  )

  /** Deterministic fake payloads derived from documents — exercise the
    * binary-column path without external data.
    */
  def syntheticMedia(spark: SparkSession, sfDir: String, limitN: Int = 2000): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .limit(limitN)
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val bytes = (if (text == null) "" else text.take(512))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        MediaRow(id, kind, bytes)
      }
  }

  /** STUB decoder: deterministic pseudo-decode of a binary payload. A real
    * implementation would dispatch on `kind` to an image/audio codec here;
    * everything around it (batching, schema, error isolation) is the real
    * production shape.
    */
  def decodeStub(row: MediaRow): MediaFeatures = {
    if (row.payload == null || row.payload.isEmpty)
      return MediaFeatures(row.media_id, row.kind, 0L, decode_ok = false, 0, 0, 0,
        Array.fill(16)(0.0f))
    var h = 0xcbf29ce484222325L
    row.payload.foreach { b => h ^= (b & 0xff).toLong; h *= 0x100000001b3L }
    val width = 64 + (math.abs(h) % 1024).toInt
    val height = 64 + (math.abs(h >> 10) % 1024).toInt
    val frames = if (row.kind == "video") 1 + (math.abs(h >> 20) % 64).toInt else 1
    val feat = new Array[Float](16)
    var i = 0
    var z = h
    while (i < 16) {
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      feat(i) = ((z >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    MediaFeatures(row.media_id, row.kind, row.payload.length.toLong, decode_ok = true,
      width, height, frames, feat)
  }

  /** Batch feature extraction over binary columns: mapPartitions so a real
    * decoder can amortize per-batch setup (model load, codec context) —
    * the Scala-native analogue of `mapInPandas` batch processing.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup happens once here (real decoder: open codec)
      it.map(decodeStub)
    }
  }

  /** Kind-level stats over extracted features (hash aggregate). */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame = {
    features.toDF().groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      sum(when(col("decode_ok"), 1L).otherwise(0L)).as("decoded"),
      sum(col("n_bytes")).as("total_bytes"),
      round(avg(col("width")), 2).as("avg_width"),
      round(avg(col("n_frames")), 2).as("avg_frames")
    ).orderBy(col("kind"))
  }
}
