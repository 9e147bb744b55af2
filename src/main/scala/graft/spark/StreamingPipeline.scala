package graft.spark

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.core.detect.DetectConfig

/** Per-document crawl metric row (event-time = warc_ts). */
final case class CrawlMetric(
    host: String,
    warc_ts: Timestamp,
    n_tables: Int,
    parse_failed: Boolean,
    bytes_stripped: Long
)

/** One closed crawl session for a host (gap-based sessionization state). */
final case class CrawlSession(host: String, start: Timestamp, end: Timestamp, docs: Long)

/** flatMapGroupsWithState state record. */
final case class SessionState(startMs: Long, endMs: Long, docs: Long)

/** A streaming near-duplicate pair (event-time = the later arrival).
  * Emission is at-least-once: a pair colliding in several minhash bands is
  * emitted by each bucket — the downstream sink dedups (id_a, id_b) per
  * micro-batch / on read, the same idempotent-sink pattern the parquet
  * file sink already relies on for exactly-once.
  */
final case class NearDupPair(id_a: Long, id_b: Long, est_jaccard: Double, ts: Timestamp)

/** One banded-minhash row feeding the stateful bucket operator. */
final case class BandedDoc(id: Long, ts: Timestamp, sig: Array[Long], band: Int, bhash: Long)

/** Per-bucket exemplar buffer: parallel arrays, signatures flattened to
  * one n×k array (nested arrays kept out of the state encoder's hot path).
  */
final case class BucketState(ids: Array[Long], tsMs: Array[Long], flatSigs: Array[Long])

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

  private def hostOf(url: String): String = {
    val i = url.indexOf("://")
    if (i < 0) return ""
    val from = i + 3
    val j = url.indexOf('/', from)
    if (j < 0) url.substring(from) else url.substring(from, j)
  }

  /** Kernel → per-document metric rows keyed by host with event time.
    * Works identically on batch and streaming Datasets.
    */
  def crawlMetrics(pages: Dataset[Page], config: DetectConfig = DetectConfig())
      : Dataset[CrawlMetric] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.map { p =>
        val e = Pipeline.extractOne(p, config, pid)
        CrawlMetric(hostOf(p.url), p.warc_ts, e.n_tables, e.parse_failed, e.bytes_stripped)
      }
    }
  }

  /** Event-time windowed crawl metrics with a watermark: per (window, host)
    * doc/table/failure/bytes counts. In streaming append mode a window is
    * emitted exactly once, when the watermark passes its end; late rows
    * beyond the watermark are dropped. On a batch Dataset the same code is
    * a plain window aggregate (watermark is a no-op), so batch output is
    * the oracle for the streamed output.
    */
  def windowedMetrics(pages: Dataset[Page], config: DetectConfig = DetectConfig(),
      windowDur: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    crawlMetrics(pages, config)
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowDur).as("win"), col("host"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_tables").cast("long")).as("tables"),
        sum(when(col("parse_failed"), 1L).otherwise(0L)).as("parse_failures"),
        sum(col("bytes_stripped")).as("bytes_stripped"))
      .select(col("win.start").as("window_start"), col("host"),
        col("docs"), col("tables"), col("parse_failures"), col("bytes_stripped"))
  }

  /** Streaming exact dedup — the streaming analogue of `Dedup.exact`: the
    * first arrival per canonical-text SHA-256 survives. State is kept only
    * within the watermark horizon (`dropDuplicatesWithinWatermark`), so it
    * stays bounded on an unbounded crawl — a plain streaming
    * dropDuplicates would accumulate every hash seen forever. Exact-dup
    * pages almost always recur within a crawl window (mirrors, retries),
    * which is the horizon this bounds; cross-epoch dedup belongs to the
    * batch `Dedup.exact` pass over the accumulated snapshot.
    */
  def dedupStream(pages: Dataset[Page], config: DetectConfig = DetectConfig(),
      watermark: String = "2 hours"): DataFrame = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.map { p =>
        val e = Pipeline.extractOne(p, config, pid)
        (p.url, p.warc_ts, e.text_sha256, e.parse_failed)
      }
    }.toDF("url", "warc_ts", "text_sha256", "parse_failed")
      .filter(!col("parse_failed"))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("text_sha256")
  }

  /** Gap-based crawl sessionization per host via flatMapGroupsWithState
    * with an event-time timeout: a session closes (and is emitted, append
    * mode) when the watermark passes its end + gap. The custom-state
    * analogue of the batch q_events_sessions query.
    */
  def sessionize(pages: Dataset[Page], gapMinutes: Int = 30,
      watermark: String = "2 hours"): Dataset[CrawlSession] = {
    import pages.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    val keyed = crawlMetrics(pages)
      .withWatermark("warc_ts", watermark)
      .groupByKey(_.host)

    def update(host: String, events: Iterator[CrawlMetric],
        state: GroupState[SessionState]): Iterator[CrawlSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(CrawlSession(host, new Timestamp(s.startMs), new Timestamp(s.endMs),
          s.docs))
      } else {
        val ts = events.map(_.warc_ts.getTime).toArray
        java.util.Arrays.sort(ts)
        val closed = Vector.newBuilder[CrawlSession]
        var cur = state.getOption
        ts.foreach { t =>
          cur match {
            case Some(s) if t - s.endMs <= gapMs =>
              cur = Some(SessionState(s.startMs, math.max(s.endMs, t), s.docs + 1))
            case Some(s) =>
              closed += CrawlSession(host, new Timestamp(s.startMs), new Timestamp(s.endMs),
                s.docs)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.endMs + gapMs)
        }
        closed.result().iterator
      }
    }

    keyed.flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming MinHash-LSH near-duplicate pairs — the streaming analogue of
    * [[graft.ops.Dedup.minhashPairs]] for continuously landing crawl data:
    * online near-dup detection against everything seen within the event-time
    * horizon, without re-scanning the corpus.
    *
    * Same pipeline semantics as batch, re-cut for unbounded input: the
    * native `minhashSig` / `minhashBandHashes` expressions run in the
    * stateless prefix (content-free docs dropped exactly like batch), and
    * the batch banded SELF-JOIN becomes a stateful per-(band, bandhash)
    * bucket: each bucket keeps up to `bucketCap` exemplar signatures within
    * the horizon, every new arrival is verified against them (slot-match
    * estimate from the FULL signatures — the same est_jaccard the batch
    * verify computes), and pairs at `threshold` or above are emitted with
    * `id_a < id_b`.
    *
    * Scale/state design (the parts that matter at crawl scale):
    *  - State is bounded by watermark eviction on BOTH axes: exemplars are
    *    pruned once they can no longer pair with any non-late arrival
    *    (`exemplar ts + horizon < watermark`), and a bucket's state times
    *    out (EventTimeTimeout) once its newest exemplar ages out. Per-bucket
    *    state is ≤ bucketCap × (16 + 8·k) bytes.
    *  - `bucketCap` is the batch operator's bucket-cap analogue: a giant
    *    clone class floods one bucket per band; capping bounds both state
    *    and per-arrival verify work at the cost of recall INSIDE the flood
    *    window (first-cap-wins, deterministic by event time then id).
    *    Exact-dup suppression ([[dedupStream]]) belongs upstream of this.
    *  - Emission is at-least-once across bands (see [[NearDupPair]]);
    *    within a bucket a pair is emitted once.
    *  - The banded exchange carries the FULL signature with every band row
    *    (k·8 bytes × bands per doc) — unlike the batch operator's id-only
    *    exchange, because the stateful bucket must store exemplar
    *    signatures and verify arrivals in place; an id-keyed re-attach
    *    would need a second stateful join. The amplification is bounded by
    *    a micro-batch (not the corpus), and bulk dedup of accumulated data
    *    belongs to the batch operator anyway.
    *  - Rows with a NULL event time are dropped up front: they cannot
    *    participate in an event-time-bounded operator (they would NPE the
    *    state function and wedge the query on checkpoint replay).
    *  - Cross-horizon duplicates are out of scope by design — that is the
    *    batch `minhashPairs` pass over the accumulated snapshot, exactly
    *    like dedupStream vs Dedup.exact.
    *
    * Restarting from a checkpoint with a DIFFERENT `k` fails loudly (the
    * stored signature stride no longer matches); a smaller `bucketCap`
    * keeps the first `bucketCap` stored exemplars.
    */
  def nearDupPairs(docs: DataFrame, idCol: String = "doc_id", tsCol: String = "warc_ts",
      textCol: String = "text", k: Int = 64, bands: Int = 16, shingleN: Int = 3,
      threshold: Double = 0.8, horizonMinutes: Int = 120, bucketCap: Int = 64)
      : Dataset[NearDupPair] = {
    require(k % bands == 0, "k must be divisible by bands")
    require(bucketCap > 0, "bucketCap > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.DedupFunctions
    val horizonMs = horizonMinutes * 60000L

    val banded = docs
      .filter(col(tsCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        DedupFunctions.minhashSig(coalesce(col(textCol), lit("")), k, shingleN).as("sig"))
      .filter(size(col("sig")) > 0)
      .withWatermark("ts", s"$horizonMinutes minutes")
      .select(col("id"), col("ts"), col("sig"),
        posexplode(DedupFunctions.minhashBandHashes(col("sig"), bands)))
      .toDF("id", "ts", "sig", "band", "bhash")
      .as[BandedDoc]

    def update(key: (Int, Long), events: Iterator[BandedDoc],
        state: GroupState[BucketState]): Iterator[NearDupPair] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val wm = state.getCurrentWatermarkMs()
      // deterministic processing order regardless of shuffle arrival order
      val evs = events.toArray.sortBy(e => (e.ts.getTime, e.id))
      val stored = state.getOption
      stored.foreach { s =>
        // fail loudly on a checkpoint written with a different k — reading
        // misaligned signature slices would emit silently wrong estimates
        require(s.flatSigs.length == s.ids.length * k,
          s"near-dup checkpoint state has signature stride ${
            if (s.ids.length > 0) s.flatSigs.length / s.ids.length else 0
          }, operator has k=$k — restart with the original k")
      }
      // capacity: what this invocation can actually hold — not bucketCap
      // up front (at cap 4096 that is ~2 MB of transient arrays per key
      // per micro-batch regardless of occupancy)
      val capNow = math.min(bucketCap,
        stored.map(_.ids.length).getOrElse(0) + evs.length)
      var ids = new Array[Long](capNow)
      var tsMs = new Array[Long](capNow)
      var flat = new Array[Long](capNow * k)
      var n = 0
      stored.foreach { s =>
        // load exemplars, pruning any that can no longer pair with a
        // non-late arrival (every future event has ts >= watermark); a
        // restart with a SMALLER bucketCap keeps the first `bucketCap`
        // stored exemplars (same first-arrival-wins as the live cap)
        var i = 0
        while (i < s.ids.length && n < capNow) {
          if (s.tsMs(i) + horizonMs >= wm) {
            ids(n) = s.ids(i); tsMs(n) = s.tsMs(i)
            System.arraycopy(s.flatSigs, i * k, flat, n * k, k)
            n += 1
          }
          i += 1
        }
      }
      val out = Vector.newBuilder[NearDupPair]
      evs.foreach { e =>
        val eMs = e.ts.getTime
        var dup = false
        var i = 0
        while (i < n) {
          if (ids(i) == e.id) dup = true
          else if (math.abs(eMs - tsMs(i)) <= horizonMs) {
            var m = 0
            var j = 0
            val base = i * k
            while (j < k) { if (flat(base + j) == e.sig(j)) m += 1; j += 1 }
            val est = m.toDouble / k
            if (est >= threshold)
              out += NearDupPair(math.min(ids(i), e.id), math.max(ids(i), e.id), est,
                new Timestamp(math.max(eMs, tsMs(i))))
          }
          i += 1
        }
        if (!dup && n < capNow) { // capNow <= bucketCap: same cap semantics
          ids(n) = e.id; tsMs(n) = eMs
          System.arraycopy(e.sig, 0, flat, n * k, k)
          n += 1
        }
      }
      if (n > 0) {
        state.update(BucketState(java.util.Arrays.copyOf(ids, n),
          java.util.Arrays.copyOf(tsMs, n), java.util.Arrays.copyOf(flat, n * k)))
        var newest = Long.MinValue
        var i = 0
        while (i < n) { if (tsMs(i) > newest) newest = tsMs(i); i += 1 }
        // strictly after the newest exemplar ages out; always > watermark
        // because every retained exemplar satisfies tsMs + horizon >= wm
        state.setTimeoutTimestamp(newest + horizonMs + 1)
      } else state.remove()
      out.result().iterator
    }

    banded.groupByKey(d => (d.band, d.bhash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stream-static incremental near-dedup: near-dup matches between an
    * arriving doc stream and a STATIC corpus — the streaming face of
    * [[graft.ops.Dedup.minhashPairsIncremental]] (screen an incoming crawl
    * against what the corpus already holds, as it lands; [[nearDupPairs]]
    * covers stream-vs-stream within the horizon).
    *
    * Scale/state design:
    *  - The whole query is STATELESS: signatures + band hashes run in the
    *    stateless prefix and the candidate lookup is a stream-static INNER
    *    join on (band, bhash) — no watermark, no state store, nothing to
    *    expire. A stream-static join re-evaluates the static plan every
    *    micro-batch, so the corpus band index + signature set are
    *    materialized ONCE at query start (Materialize.iterative: the
    *    per-micro-batch re-read is the loop case, a Recompute no-op would
    *    re-run the corpus sig expressions per batch).
    *  - The persisted corpus artifact is scalar-only (id + band + 8-byte
    *    hash); corpus signatures attach by id for the verify, exactly as
    *    in the batch operator.
    *  - The arriving doc's signature rides its band rows into the join —
    *    bounded by the micro-batch, the same trade as [[nearDupPairs]].
    *  - Emission is AT-LEAST-ONCE per (doc, corpus doc) pair across bands
    *    (idempotent sink / downstream distinct dedups, as [[nearDupPairs]]).
    *
    * Emits (corpus_id, doc_id, est_jaccard, ts), append-only; distinct
    * rows equal the batch operator's pairs over the same inputs.
    */
  def corpusDedupMatches(docs: DataFrame, corpus: DataFrame,
      idCol: String = "doc_id", tsCol: String = "warc_ts", textCol: String = "text",
      k: Int = 64, bands: Int = 16, shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    import graft.functions.DedupFunctions
    import graft.ops.Materialize
    val cSigs = Materialize.iterative(
      corpus.select(col(idCol).cast("long").as("corpus_id"),
          DedupFunctions.minhashSig(coalesce(col(textCol), lit("")), k, shingleN)
            .as("corpus_sig"))
        .filter(size(col("corpus_sig")) > 0),
      Materialize.fromEnv)
    val cBand = Materialize.iterative(
      cSigs.select(col("corpus_id"),
          posexplode(DedupFunctions.minhashBandHashes(col("corpus_sig"), bands)))
        .toDF("corpus_id", "band", "bhash"),
      Materialize.fromEnv)
    val banded = docs
      .filter(col(tsCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        DedupFunctions.minhashSig(coalesce(col(textCol), lit("")), k, shingleN).as("sig"))
      .filter(size(col("sig")) > 0)
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(DedupFunctions.minhashBandHashes(col("sig"), bands)))
      .toDF("doc_id", "ts", "sig", "band", "bhash")
    banded
      .join(cBand, Seq("band", "bhash"))
      // a doc re-arriving under its corpus id must not match itself
      .filter(col("corpus_id") =!= col("doc_id"))
      .join(cSigs, Seq("corpus_id"))
      .select(col("corpus_id"), col("doc_id"), col("ts"),
        (aggregate(zip_with(col("corpus_sig"), col("sig"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / lit(k)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Streaming contamination screen: arriving docs matched against a
    * STATIC evaluation set by exact word-n-gram overlap — the streaming
    * face of [[graft.ops.Dedup.ngramContamination]] (flag eval-leaking
    * docs as they land, before they ever reach the training corpus).
    *
    * Fully STATELESS: the doc side is a map-side n-gram projection (the
    * same codegen'd built-ins as batch — stateless, so it runs unchanged
    * on a stream) into a stream-static inner join against the
    * (benchmark-sized, effectively broadcast) eval n-gram set — no
    * watermark, no state store. Emits ONE row per matched (doc, eval,
    * ngram) in append mode; the per-pair distinct count — batch's
    * shared_ngrams — is the sink-side aggregate, exactly the
    * at-least-once + idempotent-sink pattern of [[nearDupPairs]] /
    * [[corpusDedupMatches]] (a streaming groupBy would otherwise need a
    * watermark the screen does not want: a doc's verdict must not wait
    * out an event-time horizon). The eval set is materialized once at
    * query start (stream-static re-evaluates the static side per
    * micro-batch; Materialize.iterative — the loop case).
    *
    * Distinct (doc_id, eval_id, ngram) rows equal the batch operator's
    * pre-aggregate join output; grouping them reproduces shared_ngrams
    * exactly (StreamingSpec pins both).
    */
  def contaminationMatches(docs: DataFrame, evalSet: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 13): DataFrame = {
    import graft.ops.{Dedup, Materialize}
    val e = Materialize.iterative(
      Dedup.wordNgrams(evalSet, idCol, textCol, n, "eval_id").distinct(),
      Materialize.fromEnv)
    Dedup.wordNgrams(docs, idCol, textCol, n, "doc_id")
      .join(e, Seq("ngram"))
      .select(col("doc_id"), col("eval_id"), col("ngram"))
  }

  /** Streaming passage screen: every arriving doc's `w`-token windows
    * matched against a STATIC corpus passage-fingerprint set — the
    * streaming face of [[graft.ops.Dedup.passageMatchesAgainst]] (flag
    * boilerplate passages the corpus already holds, as docs land).
    * Fully STATELESS, the [[contaminationMatches]] shape: the doc side is
    * a map-side fingerprint projection into a stream-static inner join on
    * the 8-byte fingerprint — no watermark, no state store. The corpus
    * side is deduped to one row per fingerprint and materialized ONCE at
    * query start (stream-static re-evaluates the static plan per
    * micro-batch; [[graft.ops.Materialize.iterative]]). Emits one row per
    * matched (doc window, canonical corpus occurrence) in append mode;
    * distinct rows equal the batch operator's output over the same docs
    * (StreamingSpec-pinned).
    */
  def passageMatches(docs: DataFrame, corpusFps: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", w: Int = 50): DataFrame = {
    import graft.ops.{Dedup, Materialize}
    val canon = Materialize.iterative(Dedup.canonicalPassageFps(corpusFps),
      Materialize.fromEnv)
    Dedup.passageFingerprints(docs, idCol, textCol, w)
      .join(canon, Seq("fp"))
      .select(col("doc_id"), col("pos"), col("fp"), col("corpus_id"), col("corpus_pos"))
  }

  /** One passage-ingest micro-batch against the PERSISTED passage index —
    * the transform analogue of [[ingestMicroBatch]]: the batch is stripped
    * of every window the corpus already holds
    * ([[graft.ops.Dedup.stripPassagesAgainst]]), then self-stripped within
    * the batch ([[graft.ops.Dedup.stripDuplicatePassages]]); the rewritten
    * rows land in `outDir/rewritten/<segment>`, and the REWRITTEN docs'
    * fingerprints (what the corpus now actually holds) append to the index
    * — so later arrivals dedup against every passage kept before them.
    *
    * Idempotent under `segment` with the index append as the COMMIT POINT
    * (the [[ingestMicroBatch]] contract): a replay before the append
    * recomputes identically (the pipeline is deterministic given the index
    * state); a replay after it is a no-op — recomputing would excise the
    * batch against its OWN appended fingerprints, whose canonical
    * occurrences now live in the index. `maxSegments > 0` bounds segment
    * growth via post-commit compact+vacuum. Single-writer per index dir.
    */
  def ingestPassageMicroBatch(batch: DataFrame, indexDir: String, outDir: String,
      segment: String, idCol: String = "doc_id", textCol: String = "text",
      maxSegments: Int = 0): Boolean = {
    import graft.ops.{Dedup, PassageIndex}
    if (PassageIndex.readMeta(indexDir).committed.contains(segment)) return false
    val spark = batch.sparkSession
    val idx = PassageIndex.load(spark, indexDir)
    val rewritten = Dedup.stripDuplicatePassages(spark,
      Dedup.stripPassagesAgainst(idx.fps, batch, idCol, textCol, idx.w),
      idCol, textCol, idx.w)
    rewritten.write.mode("overwrite").parquet(s"$outDir/rewritten/$segment")
    val delta = Dedup.passageFingerprints(
      spark.read.parquet(s"$outDir/rewritten/$segment"), idCol, textCol, idx.w)
    PassageIndex.appendSegment(graft.ops.PassageIndex(delta, idx.w),
      indexDir, segment)
    if (maxSegments > 0 && PassageIndex.readMeta(indexDir).segments.size > maxSegments) {
      PassageIndex.compact(spark, indexDir)
      PassageIndex.vacuum(indexDir)
    }
    true
  }

  /** Streaming passage APPLY — each arriving doc rewritten with every
    * already-seen passage excised, the index growing with what survives:
    * the streaming face of the Lee-et-al strip, mirroring
    * [[dedupApplyStream]] (no Spark state store — the persisted
    * [[graft.ops.PassageIndex]] IS the state, shared with the batch
    * operators; micro-batch = ingest unit; earlier-kept passages win
    * across batches, component-canonical within one).
    *
    * `indexDir` must hold an initialized index
    * ([[graft.ops.PassageIndex.write]] of the corpus fingerprints — or of
    * an empty frame to start cold).
    */
  def passageApplyStream(docs: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, idCol: String = "doc_id", textCol: String = "text",
      availableNow: Boolean = false, maxSegments: Int = 16): StreamingQuery = {
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestPassageMicroBatch(b.toDF(), indexDir, outDir, s"batch_$batchId",
          idCol, textCol, maxSegments)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Streaming line screen: every arriving doc's normalized lines matched
    * against a STATIC corpus line-fingerprint set — the streaming face of
    * [[graft.ops.Dedup.lineMatchesAgainst]] (flag boilerplate lines the
    * corpus already holds, as docs land). Fully STATELESS, the
    * [[passageMatches]] shape: map-side fingerprint projection into a
    * stream-static inner join on the 8-byte fingerprint — no watermark,
    * no state store; the corpus side is deduped to one row per
    * fingerprint and materialized ONCE at query start.
    */
  def lineMatches(docs: DataFrame, corpusFps: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.ops.{Dedup, Materialize}
    val canon = Materialize.iterative(Dedup.canonicalLineFps(corpusFps),
      Materialize.fromEnv)
    Dedup.lineFingerprints(docs, idCol, textCol)
      .join(canon, Seq("fp"))
      .select(col("doc_id"), col("line_no"), col("fp"),
        col("corpus_id"), col("corpus_line"))
  }

  /** One line-ingest micro-batch against the PERSISTED line index — the
    * line analogue of [[ingestPassageMicroBatch]]: the batch is stripped
    * of every line the corpus already holds
    * ([[graft.ops.Dedup.stripLinesAgainst]]), then self-stripped within
    * the batch ([[graft.ops.Dedup.stripDuplicateLines]]); the rewritten
    * rows land in `outDir/rewritten/<segment>`, and the rewritten docs'
    * line fingerprints append to the index. (A line excision cannot
    * create NEW lines — unlike the passage rewrite — so fingerprinting
    * the rewritten parquet is a single-source-of-truth choice, not a
    * semantic necessity: the index holds exactly what the written corpus
    * holds.)
    *
    * Idempotent under `segment` with the index append as the COMMIT POINT
    * (the [[ingestMicroBatch]] contract); `maxSegments > 0` bounds
    * segment growth via post-commit compact+vacuum. Single-writer per
    * index dir.
    */
  def ingestLineMicroBatch(batch: DataFrame, indexDir: String, outDir: String,
      segment: String, idCol: String = "doc_id", textCol: String = "text",
      maxSegments: Int = 0): Boolean = {
    import graft.ops.{Dedup, LineIndex}
    if (LineIndex.readMeta(indexDir).committed.contains(segment)) return false
    val spark = batch.sparkSession
    val idx = LineIndex.load(spark, indexDir)
    val rewritten = Dedup.stripDuplicateLines(spark,
      Dedup.stripLinesAgainst(idx.fps, batch, idCol, textCol), idCol, textCol)
    rewritten.write.mode("overwrite").parquet(s"$outDir/rewritten/$segment")
    val delta = Dedup.lineFingerprints(
      spark.read.parquet(s"$outDir/rewritten/$segment"), idCol, textCol)
    LineIndex.appendSegment(graft.ops.LineIndex(delta), indexDir, segment)
    if (maxSegments > 0 && LineIndex.readMeta(indexDir).segments.size > maxSegments) {
      LineIndex.compact(spark, indexDir)
      LineIndex.vacuum(indexDir)
    }
    true
  }

  /** Streaming line APPLY — each arriving doc rewritten with every
    * already-seen boilerplate line excised, the index growing with what
    * survives: the streaming face of the CCNet line screen, mirroring
    * [[passageApplyStream]] (no Spark state store — the persisted
    * [[graft.ops.LineIndex]] IS the state, shared with the batch
    * operators; earlier-kept lines win across batches).
    *
    * `indexDir` must hold an initialized index
    * ([[graft.ops.LineIndex.write]] of the corpus fingerprints — or of an
    * empty frame to start cold).
    */
  def lineApplyStream(docs: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, idCol: String = "doc_id", textCol: String = "text",
      availableNow: Boolean = false, maxSegments: Int = 16): StreamingQuery = {
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestLineMicroBatch(b.toDF(), indexDir, outDir, s"batch_$batchId",
          idCol, textCol, maxSegments)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Streaming decontamination APPLY — the kept/flagged verdict per
    * arriving doc ([[contaminationMatches]] stops at match events; this
    * closes the loop, mirroring [[dedupApplyStream]]'s verdict surface):
    * each micro-batch is screened against the static eval set and lands
    * per-doc verdicts plus the kept rows in segment-keyed parquet.
    *
    * Per-doc verdicts need the doc's matches AGGREGATED (did ANY n-gram
    * hit, and against which eval doc) — a streaming groupBy would demand a
    * watermark the screen must not wait out (a doc's verdict is final the
    * moment its micro-batch is screened; the eval set is static). So the
    * aggregate runs inside foreachBatch: bounded by the micro-batch,
    * stateless across batches, no state store. The eval n-gram set is
    * tokenized ONCE at query start and materialized
    * ([[graft.ops.Dedup.ngramContaminationAgainst]]); each batch pays one
    * map-side n-gram scan into the broadcast join — the batch operator's
    * exact plan over micro-batch-sized input.
    *
    * Output per segment `batch_<id>`:
    *  - `verdicts/`: (id, verdict ∈ {kept, flagged}, match_id = lowest
    *    matching eval id or null, shared_ngrams with that eval doc).
    *  - `kept/`: the surviving rows, input columns preserved.
    * Replay-idempotent by determinism: the eval set never changes, so a
    * replayed micro-batch overwrites its segment with identical bytes
    * (no commit-point ordering needed, unlike the index-growing dedup
    * apply). Verdicts are the decontaminate operator's semantics exactly:
    * kept set ≡ [[graft.ops.Dedup.decontaminate]] on the same rows
    * (StreamingSpec-pinned).
    */
  def decontaminateApplyStream(docs: DataFrame, evalSet: DataFrame, outDir: String,
      checkpointDir: String, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 13, minShared: Int = 1,
      availableNow: Boolean = false): StreamingQuery = {
    import graft.ops.{Dedup, Materialize}
    val evalNgrams = Materialize.iterative(
      Dedup.wordNgrams(evalSet, idCol, textCol, n, "eval_id").distinct(),
      Materialize.fromEnv)
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val batch = b.toDF()
        val contam = Dedup.ngramContaminationAgainst(batch, evalNgrams,
          idCol, textCol, n, minShared)
        // one row per flagged doc: lowest matching eval id (deterministic),
        // with that pair's shared count. Materialized: verdicts AND the
        // kept anti-join both consume it — unmaterialized each re-runs the
        // screen join.
        val flagged = Materialize.iterative(
          contam.groupBy(col("doc_id"))
            .agg(min(struct(col("eval_id"), col("shared_ngrams"))).as("_m"))
            .select(col("doc_id").as("_flag_id"),
              col("_m.eval_id").as("_match_id"),
              col("_m.shared_ngrams").as("_shared")),
          Materialize.fromEnv)
        val ids = batch.select(col(idCol).cast("long").as("id"))
        ids.join(flagged, ids("id") === col("_flag_id"), "left")
          .select(col("id"),
            when(col("_flag_id").isNotNull, lit("flagged"))
              .otherwise(lit("kept")).as("verdict"),
            col("_match_id").as("match_id"),
            col("_shared").as("shared_ngrams"))
          .write.mode("overwrite").parquet(s"$outDir/verdicts/batch_$batchId")
        batch.join(flagged, batch(idCol) === col("_flag_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$outDir/kept/batch_$batchId")
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** One dedup-ingest micro-batch against the PERSISTED corpus index: the
    * unit of [[dedupApplyStream]], callable directly for scheduled (cron)
    * daily ingests. Runs [[graft.ops.Dedup.ingestIncremental]] against the
    * index at `indexDir`, writes per-doc verdicts and the surviving rows to
    * segment-keyed parquet directories under `outDir`, then appends the
    * survivors' signatures to the index ([[graft.ops.MinhashIndex.appendSegment]]).
    *
    * Idempotent under `segment` (crash/restart contract): the index append
    * is the COMMIT POINT and runs last. A replay after a crash before the
    * append recomputes against the unchanged index (same verdicts — the
    * pipeline is deterministic) and overwrites the same output directories;
    * a replay after the append is a no-op (returns false) — recomputing
    * would be WRONG, the batch would match its own survivors in the grown
    * index. Readers of `outDir` see only segments whose index append
    * committed or whose outputs are complete — at-least-once visibility of
    * the final attempt's files, exactly the parquet-sink contract.
    *
    * Returns true if the segment was processed, false if already committed.
    *
    * `maxSegments > 0` bounds the index's segment count: once an append
    * pushes the live-segment count past it, the index is compacted into
    * one fresh base segment and orphaned data vacuumed
    * ([[graft.ops.MinhashIndex.compact]]/[[graft.ops.MinhashIndex.vacuum]]) —
    * without this, days of streaming accrete one tiny parquet directory per
    * micro-batch, the exact small-file storm the snapshot path measured at
    * 9x wall. Compaction runs strictly AFTER the segment commit point, so
    * crash/replay semantics are unchanged (a replayed batch stays a no-op
    * via the manifest's absorbed-name record; a crash mid-compact leaves
    * the pre-compact manifest fully readable and the next batch retries).
    *
    * SINGLE WRITER per index directory (the manifest update is a
    * read-modify-write — see [[graft.ops.MinhashIndex.appendSegment]]);
    * the streaming caller satisfies this by construction, scheduled (cron)
    * callers must not overlap invocations on one index.
    */
  def ingestMicroBatch(batch: DataFrame, indexDir: String, outDir: String,
      segment: String, idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, bucketCap: Int = 65536,
      maxSegments: Int = 0): Boolean = {
    import graft.ops.{Dedup, MinhashIndex}
    if (MinhashIndex.readMeta(indexDir).committed.contains(segment)) return false
    val spark = batch.sparkSession
    val idx = MinhashIndex.load(spark, indexDir)
    val res = Dedup.ingestIncremental(spark, idx, batch, idCol, textCol,
      threshold, bucketCap)
    res.verdicts.write.mode("overwrite").parquet(s"$outDir/verdicts/$segment")
    res.survivors.write.mode("overwrite").parquet(s"$outDir/survivors/$segment")
    MinhashIndex.appendSegment(res.batchIndex, indexDir, segment)
    if (maxSegments > 0 && MinhashIndex.readMeta(indexDir).segments.size > maxSegments) {
      MinhashIndex.compact(spark, indexDir)
      MinhashIndex.vacuum(indexDir)
    }
    true
  }

  /** Streaming near-dedup APPLY — the kept/dropped verdict per arriving
    * doc, not just match pairs ([[corpusDedupMatches]] stops at pairs; this
    * closes the loop): each micro-batch is one incremental-ingest step
    * against the persisted corpus index, and the index GROWS with the
    * batch's survivors, so later arrivals dedup against everything kept
    * before them — corpus-match → dropped_corpus; in-stream near-dup →
    * the component's min-id arrival survives, the rest → dropped_batch.
    *
    * Semantics: the survivor set is the left fold of
    * [[graft.ops.Dedup.applyIncremental]] over the micro-batch sequence —
    * byte-identical to the batch operator when the input fits one
    * micro-batch, and to a sequence of daily batch ingests otherwise
    * (micro-batch = ingest unit). Within a micro-batch the verdict is the
    * batch operator's component-min (NOT a greedy first-arrival
    * approximation); across micro-batches earlier-kept wins, which is what
    * a production ingest means by first-arrival.
    *
    * Scale/state design: NO Spark state store at all — the state is the
    * persisted [[graft.ops.MinhashIndex]] (scalar parquet: id + band +
    * 8-byte hash + signatures), the same artifact the batch pipeline
    * persists, shared between the two. Per micro-batch the work is
    * O(batch map + batch × collision-rate join); the corpus side is never
    * re-signatured. Restart-safety: Spark's checkpoint replays the last
    * micro-batch and [[ingestMicroBatch]]'s segment commit makes the
    * replay idempotent.
    *
    * `indexDir` must hold an initialized index ([[graft.ops.MinhashIndex.write]]
    * of the existing corpus — or of an empty frame to start cold).
    *
    * `maxSegments` (default 16) keeps the long-running stream's index at a
    * bounded segment count via post-commit compaction + vacuum (see
    * [[ingestMicroBatch]]); 0 disables maintenance.
    */
  def dedupApplyStream(docs: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, bucketCap: Int = 65536,
      availableNow: Boolean = false, maxSegments: Int = 16): StreamingQuery = {
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestMicroBatch(b.toDF(), indexDir, outDir, s"batch_$batchId",
          idCol, textCol, threshold, bucketCap, maxSegments)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
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
