package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A MinHash-LSH corpus index: the signature set plus the banded candidate
  * index, with the parameters that produced them.
  *
  *  - `sigs`: (id long, sig array<long>) — one row per content-bearing doc
  *    (content-free docs have no signature and are absent by construction).
  *  - `banded`: (id long, band int, bhash long) — `bands` rows per doc, the
  *    8-byte band-fold hashes. This is the candidate index: near-dup
  *    candidates are ids sharing any (band, bhash) key. Scalar-only — at
  *    ingest scale this is what crosses the wire, never signatures or text.
  *
  * This is the artifact a production near-dedup pipeline PERSISTS between
  * ingests ([[MinhashIndex.write]] / [[MinhashIndex.load]]): signatures are
  * a pure function of doc text, so recomputing them for an unchanged corpus
  * on every daily batch is O(corpus) tokenize+shingle map work paid for no
  * new information. A persisted index makes each ingest O(batch) map work +
  * O(batch × collision rate) join work ([[Dedup.minhashPairsBetween]]).
  */
final case class MinhashIndex(
    sigs: DataFrame,
    banded: DataFrame,
    k: Int,
    bands: Int,
    shingleN: Int) {
  require(k > 0 && bands > 0 && k % bands == 0,
    s"k=$k must be a positive multiple of bands=$bands")
}

/** Parquet persistence for [[MinhashIndex]] with an atomic JSON manifest —
  * the same commit discipline as [[graft.spark.Snapshots]]: data files land
  * in segment-keyed directories FIRST, then one `index.json` manifest
  * (written to a temp file and ATOMIC_MOVE'd into place) lists the
  * committed segments and pins (k, bands, shingleN). A crash between the
  * two leaves an unlisted — therefore invisible — directory that a retried
  * write simply overwrites, so [[appendSegment]] is idempotent under the
  * segment name (the streaming ingest keys segments by micro-batch id).
  *
  * Loaded frames are plain parquet scans: stable storage IS the
  * materialization, so multi-branch consumers re-read columnar local data
  * instead of holding executor-local checkpoint blocks.
  */
object MinhashIndex {

  private val mapper = new ObjectMapper()

  final case class Meta(k: Int, bands: Int, shingleN: Int, segments: Seq[String])

  private def manifestPath(dir: String) = Paths.get(dir, "index.json")

  private def checkSegmentName(segment: String): Unit =
    require(segment.nonEmpty && segment.forall(c =>
        c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"segment name '$segment' must be a plain file-name token")

  def readMeta(dir: String): Meta = {
    val p = manifestPath(dir)
    require(Files.exists(p), s"no MinhashIndex manifest at $p")
    val root = mapper.readTree(Files.readAllBytes(p))
    Meta(root.get("k").asInt(), root.get("bands").asInt(),
      root.get("shingle_n").asInt(),
      root.get("segments").elements().asScala.map(_.asText()).toSeq)
  }

  private def commitManifest(dir: String, k: Int, bands: Int, shingleN: Int,
      segments: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val root = mapper.createObjectNode()
    root.put("format", 1)
    root.put("k", k)
    root.put("bands", bands)
    root.put("shingle_n", shingleN)
    val arr = root.putArray("segments")
    segments.foreach(arr.add)
    val tmp = Paths.get(dir, s".index.json.tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeSegmentFiles(idx: MinhashIndex, dir: String, segment: String): Unit = {
    idx.sigs.select("id", "sig").write.mode("overwrite")
      .parquet(s"$dir/sigs/$segment")
    idx.banded.select("id", "band", "bhash").write.mode("overwrite")
      .parquet(s"$dir/banded/$segment")
  }

  /** Write a fresh index as segment `base`, replacing any manifest already
    * at `dir` (stale segment data from a previous index is orphaned, not
    * read — the manifest is the source of truth).
    */
  def write(idx: MinhashIndex, dir: String): Unit = {
    writeSegmentFiles(idx, dir, "base")
    commitManifest(dir, idx.k, idx.bands, idx.shingleN, Seq("base"))
  }

  /** Append a delta segment (e.g. one ingest's surviving docs) idempotently:
    * returns false without touching anything when `segment` is already
    * committed — the restart contract for streaming ingest, whose segment
    * name is the micro-batch id. Fails loudly on a parameter mismatch:
    * signatures from a different (k, bands, shingleN) are not comparable.
    */
  def appendSegment(delta: MinhashIndex, dir: String, segment: String): Boolean = {
    checkSegmentName(segment)
    val m = readMeta(dir)
    require(m.k == delta.k && m.bands == delta.bands && m.shingleN == delta.shingleN,
      s"index at $dir has (k=${m.k}, bands=${m.bands}, shingleN=${m.shingleN}); " +
        s"delta has (k=${delta.k}, bands=${delta.bands}, shingleN=${delta.shingleN})")
    if (m.segments.contains(segment)) return false
    writeSegmentFiles(delta, dir, segment)
    commitManifest(dir, m.k, m.bands, m.shingleN, m.segments :+ segment)
    true
  }

  /** Load the committed index. The returned frames are parquet scans of the
    * manifest-listed segments only (an uncommitted crash leftover is never
    * read); no further materialization is needed downstream — re-reading
    * stable columnar data per plan branch is the cheap case Recompute
    * describes.
    */
  def load(spark: SparkSession, dir: String): MinhashIndex = {
    val m = readMeta(dir)
    require(m.segments.nonEmpty, s"MinhashIndex at $dir has no committed segments")
    val sigs = spark.read.parquet(m.segments.map(s => s"$dir/sigs/$s"): _*)
    val banded = spark.read.parquet(m.segments.map(s => s"$dir/banded/$s"): _*)
    MinhashIndex(sigs, banded, m.k, m.bands, m.shingleN)
  }
}
