package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, processed in partition-sized batches.
  *
  * Image decode is REAL for the container formats whose geometry lives in
  * header bytes: PNG (IHDR), GIF (logical screen descriptor), and JPEG
  * (SOF segment scan) — no external libraries needed. Audio/video decode
  * and the 16-dim feature embedding remain clearly-marked deterministic
  * stubs (this container has no codecs or models); the Spark-side contract
  * — schema, batch shape, partitioning, null/error isolation — is the real
  * production shape either way.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      decode_ok: Boolean,
      format: String, // png | gif | jpeg | "" (unknown/non-image)
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float] // fixed 16-dim STUB embedding
  )

  // ---- real image header decoders ----

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  @inline private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** PNG: 8-byte signature, then the IHDR chunk carries width/height as
    * big-endian u32 at offsets 16 and 20.
    */
  def decodePng(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 24) return None
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    var i = 0
    while (i < 8) { if (u8(b, i) != sig(i)) return None; i += 1 }
    // chunk type at 12..15 must be IHDR
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some((w.toInt, h.toInt))
  }

  /** GIF87a/GIF89a: width/height as little-endian u16 at offsets 6 and 8. */
  def decodeGif(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 10) return None
    if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        (b(4) != '7' && b(4) != '9') || b(5) != 'a') return None
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w <= 0 || h <= 0) None else Some((w, h))
  }

  /** JPEG: walk marker segments from SOI until a SOF marker (C0–CF except
    * C4/C8/CC); height/width are big-endian u16 at segment offsets +3/+5.
    */
  def decodeJpeg(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xFF) return None // desynced
      var marker = u8(b, i + 1)
      // skip fill bytes
      while (marker == 0xFF && i + 2 < b.length) { i += 1; marker = u8(b, i + 1) }
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / start-of-scan: no SOF seen
      val isSof = marker >= 0xC0 && marker <= 0xCF &&
        marker != 0xC4 && marker != 0xC8 && marker != 0xCC
      if (i + 3 >= b.length) return None
      val len = be16(b, i + 2)
      if (len < 2) return None
      if (isSof) {
        if (i + 8 >= b.length) return None
        val h = be16(b, i + 5)
        val w = be16(b, i + 7)
        return if (w > 0 && h > 0) Some((w, h)) else None
      }
      i += 2 + len
    }
    None
  }

  /** Dispatch on magic bytes. Returns (format, width, height). */
  def decodeImage(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b == null || b.length < 4) return None
    decodePng(b).map { case (w, h) => ("png", w, h) }
      .orElse(decodeGif(b).map { case (w, h) => ("gif", w, h) })
      .orElse(decodeJpeg(b).map { case (w, h) => ("jpeg", w, h) })
  }

  // ---- deterministic synthetic payloads ----

  /** Minimal real image headers (trailing bytes are arbitrary payload —
    * geometry decoders only read the header, like real thumbnail probes).
    */
  def pngBytes(w: Int, h: Int, tail: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](24 + tail.length)
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    for (i <- 0 until 8) out(i) = sig(i).toByte
    out(11) = 13 // IHDR length
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    out(16) = (w >>> 24).toByte; out(17) = (w >>> 16).toByte
    out(18) = (w >>> 8).toByte; out(19) = w.toByte
    out(20) = (h >>> 24).toByte; out(21) = (h >>> 16).toByte
    out(22) = (h >>> 8).toByte; out(23) = h.toByte
    System.arraycopy(tail, 0, out, 24, tail.length)
    out
  }

  def gifBytes(w: Int, h: Int, tail: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](10 + tail.length)
    out(0) = 'G'; out(1) = 'I'; out(2) = 'F'; out(3) = '8'; out(4) = '9'; out(5) = 'a'
    out(6) = w.toByte; out(7) = (w >>> 8).toByte
    out(8) = h.toByte; out(9) = (h >>> 8).toByte
    System.arraycopy(tail, 0, out, 10, tail.length)
    out
  }

  def jpegBytes(w: Int, h: Int, tail: Array[Byte]): Array[Byte] = {
    // SOI, SOF0 (len 17, precision 8, 3 components), then arbitrary tail
    val sof = Array[Int](0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x11, 0x08,
      (h >>> 8) & 0xFF, h & 0xFF, (w >>> 8) & 0xFF, w & 0xFF,
      0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    val out = new Array[Byte](sof.length + tail.length)
    for (i <- sof.indices) out(i) = sof(i).toByte
    System.arraycopy(tail, 0, out, sof.length, tail.length)
    out
  }

  /** Deterministic payloads derived from documents — image rows carry REAL
    * PNG/GIF/JPEG headers (parseable geometry), audio/video stay opaque.
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
        val tail = (if (text == null) "" else text.take(512))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val bytes = kind match {
          case "image" =>
            val w = 16 + (id % 640).toInt
            val h = 16 + ((id / 7) % 480).toInt
            ((id / 3) % 3) match {
              case 0 => pngBytes(w, h, tail)
              case 1 => gifBytes(w, h, tail)
              case _ => jpegBytes(w, h, tail)
            }
          case _ => tail
        }
        MediaRow(id, kind, bytes)
      }
  }

  /** STUB embedding: deterministic 16-dim vector from a payload hash. A
    * real implementation would run model inference here; everything around
    * it (batching, schema, error isolation) is the production shape.
    */
  private def stubFeature(payload: Array[Byte]): (Long, Array[Float]) = {
    var h = 0xcbf29ce484222325L
    payload.foreach { b => h ^= (b & 0xff).toLong; h *= 0x100000001b3L }
    val feat = new Array[Float](16)
    var i = 0
    var z = h
    while (i < 16) {
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      feat(i) = ((z >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    (h, feat)
  }

  /** Per-row decode: real header parsing for images; deterministic STUB
    * pseudo-decode for audio/video (no codecs in this container).
    */
  def decode(row: MediaRow): MediaFeatures = {
    if (row.payload == null || row.payload.isEmpty)
      return MediaFeatures(row.media_id, row.kind, 0L, decode_ok = false, "", 0, 0, 0,
        Array.fill(16)(0.0f))
    val (h, feat) = stubFeature(row.payload)
    row.kind match {
      case "image" =>
        decodeImage(row.payload) match {
          case Some((fmt, w, hgt)) =>
            MediaFeatures(row.media_id, row.kind, row.payload.length.toLong,
              decode_ok = true, fmt, w, hgt, 1, feat)
          case None => // corrupt image: isolated as a failed decode, not a task abort
            MediaFeatures(row.media_id, row.kind, row.payload.length.toLong,
              decode_ok = false, "", 0, 0, 0, feat)
        }
      case _ =>
        // STUB for audio/video: fabricated geometry from the payload hash
        val width = 64 + (math.abs(h) % 1024).toInt
        val height = 64 + (math.abs(h >> 10) % 1024).toInt
        val frames = if (row.kind == "video") 1 + (math.abs(h >> 20) % 64).toInt else 1
        MediaFeatures(row.media_id, row.kind, row.payload.length.toLong, decode_ok = true,
          "", width, height, frames, feat)
    }
  }

  /** Batch feature extraction over binary columns: mapPartitions so a real
    * decoder can amortize per-batch setup (model load, codec context) —
    * the Scala-native analogue of `mapInPandas` batch processing.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup happens once here (real decoder: open codec)
      it.map(decode)
    }
  }

  // ---- resize / frame-sample planning (pure geometry; the pixel work
  // would happen in the same mapPartitions batch as decode) ----

  /** Aspect-preserving resize plan: fit (w,h) inside (maxW,maxH) without
    * upscaling. Deterministic integer geometry — the part of a resize op
    * that is decoder-independent.
    */
  def resizeDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    require(maxW > 0 && maxH > 0, "bounds must be positive")
    if (w <= 0 || h <= 0) return (0, 0)
    if (w <= maxW && h <= maxH) return (w, h)
    // floor-scale on the binding axis, keep >=1
    val scale = math.min(maxW.toDouble / w, maxH.toDouble / h)
    (math.max(1, math.floor(w * scale).toInt), math.max(1, math.floor(h * scale).toInt))
  }

  /** Deterministic frame sampling for video payloads: `k` frame indices
    * spread uniformly over [0, nFrames) (FFmpeg-style thumbnail strategy —
    * midpoints of k equal spans, so the first/last frames' letterboxing
    * slates are avoided).
    */
  def sampleFrames(nFrames: Int, k: Int): Array[Int] = {
    if (nFrames <= 0 || k <= 0) return Array.empty
    if (k >= nFrames) return Array.range(0, nFrames)
    Array.tabulate(k)(i => ((2 * i + 1) * nFrames / (2 * k)).min(nFrames - 1))
  }

  /** Batch resize-plan + frame-sample over decoded features — the Spark
    * shape of the brief's resize/frame-sample ops: one projection over the
    * decode output, no extra pass over payload bytes.
    */
  def withResizePlan(features: Dataset[MediaFeatures], maxW: Int = 512, maxH: Int = 512,
      sampleK: Int = 4): DataFrame = {
    import features.sparkSession.implicits._
    features.map { f =>
      val (tw, th) = resizeDims(f.width, f.height, maxW, maxH)
      (f.media_id, f.kind, f.decode_ok, f.width, f.height, tw, th,
        sampleFrames(f.n_frames, sampleK))
    }.toDF("media_id", "kind", "decode_ok", "width", "height",
      "target_width", "target_height", "sampled_frames")
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
