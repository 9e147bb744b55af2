package graft.ops

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
  *
  * Commit/idempotency/maintenance mechanics are the shared
  * [[SegmentedManifest]] contract (absorbed-name record, compact, vacuum,
  * SINGLE WRITER per directory).
  */
object MinhashIndex {

  /** `segments` hold the LIVE data; `absorbed` are segment NAMES whose rows
    * were rewritten into a compacted segment ([[compact]]) — their data
    * directories are garbage ([[vacuum]] reclaims them) but the names stay
    * on record so [[appendSegment]]'s idempotency survives compaction: a
    * micro-batch replayed after its segment was compacted away MUST still
    * be a no-op (recomputing would match the batch against its own
    * survivors in the grown index).
    */
  final case class Meta(k: Int, bands: Int, shingleN: Int, segments: Seq[String],
      absorbed: Seq[String]) {
    /** Every segment name ever committed — the idempotency domain. */
    def committed: Set[String] = segments.toSet ++ absorbed
  }

  def readMeta(dir: String): Meta = {
    val root = SegmentedManifest.readTree(dir, "MinhashIndex")
    val (segments, absorbed) = SegmentedManifest.readSegments(root)
    Meta(root.get("k").asInt(), root.get("bands").asInt(),
      root.get("shingle_n").asInt(), segments, absorbed)
  }

  private def commitManifest(dir: String, k: Int, bands: Int, shingleN: Int,
      segments: Seq[String], absorbed: Seq[String]): Unit =
    SegmentedManifest.commit(dir, segments, absorbed) { root =>
      root.put("k", k)
      root.put("bands", bands)
      root.put("shingle_n", shingleN)
    }

  private def writeSegmentFiles(idx: MinhashIndex, dir: String, segment: String): Unit = {
    idx.sigs.select("id", "sig").write.mode("overwrite")
      .parquet(s"$dir/sigs/$segment")
    idx.banded.select("id", "band", "bhash").write.mode("overwrite")
      .parquet(s"$dir/banded/$segment")
  }

  /** Write a fresh index as segment `base`, replacing any manifest already
    * at `dir` (stale segment data from a previous index is orphaned, not
    * read — the manifest is the source of truth; [[vacuum]] reclaims the
    * bytes). Resets the ingest history: a rebuild is an explicit new
    * lineage, so previously committed segment names become appendable again.
    */
  def write(idx: MinhashIndex, dir: String): Unit = {
    writeSegmentFiles(idx, dir, "base")
    commitManifest(dir, idx.k, idx.bands, idx.shingleN, Seq("base"), Seq.empty)
  }

  /** Append a delta segment (e.g. one ingest's surviving docs) idempotently:
    * returns false without touching anything when `segment` is already
    * committed (live OR compacted away — see [[Meta.absorbed]]) — the
    * restart contract for streaming ingest, whose segment name is the
    * micro-batch id. Fails loudly on a parameter mismatch: signatures from
    * a different (k, bands, shingleN) are not comparable. Single-writer
    * ([[SegmentedManifest]]).
    */
  def appendSegment(delta: MinhashIndex, dir: String, segment: String): Boolean = {
    SegmentedManifest.checkSegmentName(segment)
    val m = readMeta(dir)
    require(m.k == delta.k && m.bands == delta.bands && m.shingleN == delta.shingleN,
      s"index at $dir has (k=${m.k}, bands=${m.bands}, shingleN=${m.shingleN}); " +
        s"delta has (k=${delta.k}, bands=${delta.bands}, shingleN=${delta.shingleN})")
    if (m.committed.contains(segment)) return false
    writeSegmentFiles(delta, dir, segment)
    commitManifest(dir, m.k, m.bands, m.shingleN, m.segments :+ segment, m.absorbed)
    true
  }

  /** Compact the manifest-listed segments into ONE fresh base segment —
    * the maintenance step that keeps a long-running streaming ingest (one
    * segment per micro-batch) from accreting thousands of tiny parquet
    * directories: the manifest grows, `load()` plans a scan over N
    * small-file directories, and small-file pressure is the exact storm
    * the snapshot path measured at 9x wall (BENCH.md). Same commit
    * discipline as every other mutation: the compacted data lands in a
    * never-before-committed segment directory FIRST, then one manifest
    * ATOMIC_MOVE swaps it in — a crash anywhere before that leaves the old
    * manifest (and all its data) fully readable, and the half-written
    * compact directory is an invisible orphan a retry overwrites and
    * [[vacuum]] reclaims. The absorbed names stay on record so replayed
    * micro-batches remain no-ops (see [[Meta.absorbed]]).
    *
    * Returns the new segment name, or None when there is nothing to do
    * (already a single segment). Single-writer, like [[appendSegment]].
    */
  def compact(spark: SparkSession, dir: String): Option[String] = {
    val m = readMeta(dir)
    if (m.segments.size <= 1) return None
    val name = SegmentedManifest.freshCompactName(m.committed)
    val live = load(spark, dir)
    // plain rewrite of the live scans: many tiny per-ingest files coalesce
    // into the writer's task-sized parquet files in one pass per side
    live.sigs.write.mode("overwrite").parquet(s"$dir/sigs/$name")
    live.banded.write.mode("overwrite").parquet(s"$dir/banded/$name")
    commitManifest(dir, m.k, m.bands, m.shingleN, Seq(name),
      (m.absorbed ++ m.segments).distinct)
    Some(name)
  }

  /** Delete segment data directories NOT listed live by the committed
    * manifest: compacted-away segments, crash leftovers from uncommitted
    * writes, and stale data orphaned by a [[write]] rebuild — the disk
    * leak the round-6 verdict flagged. Never touches a live segment or the
    * manifest itself. Returns the deleted directory names. Single-writer:
    * must not run concurrently with an in-flight append (whose segment is
    * not yet committed and would be swept).
    */
  def vacuum(dir: String): Seq[String] =
    SegmentedManifest.vacuum(dir, Seq("sigs", "banded"), readMeta(dir).segments.toSet)

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
