package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.grid.Cell
import graft.ops.Dedup
import graft.spark.Snapshots

/** Loud-failure guards and backward-compat fallbacks (round-4 ADVICE):
  * closed domains must throw on unknown values instead of silently
  * coercing, and manifest reads must survive the wall_ms→wall_share_ms
  * field rename so crash+resume works across the upgrade.
  */
class GuardsSpec extends AnyFunSuite {

  test("Cell constructor rejects an unknown dataType (closed domain)") {
    val e = intercept[IllegalArgumentException] {
      new Cell("v", "v", "bogus_type", 0, 0)
    }
    assert(e.getMessage.contains("bogus_type"))
    // the closed domain itself still round-trips
    for (dt <- Seq("string", "number", "boolean", "date", "datetime", "empty"))
      assert(new Cell("v", "v", dt, 0, 0).dataType == dt)
  }

  test("bandHashesOf rejects a signature length not divisible by bands") {
    intercept[IllegalArgumentException] { Dedup.bandHashesOf(new Array[Long](65), 16) }
    assert(Dedup.bandHashesOf(new Array[Long](64), 16).length == 16)
    // an EMPTY signature (content-free doc) is total, not a throw: the doc
    // lands in no band bucket — same drop semantics as the size(sig) > 0
    // pre-filter, so a call site missing the filter degrades instead of
    // killing the job on the first blank document (round-5 ADVICE)
    assert(Dedup.bandHashesOf(Array.emptyLongArray, 16).isEmpty)
  }

  test("connectedComponents throws loudly when maxIter is exhausted") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // a 9-hop chain needs ~3 propagate+jump rounds + 1 convergence round;
    // maxIter = 1 cannot converge → must throw, never return wrong labels
    val chain = (0 until 9).map(i => (100L + i, 101L + i)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(spark, chain, maxIter = 1)
    }
    assert(e.getMessage.contains("maxIter"))
  }

  test("Materialize.iterative never degrades to a no-op under Recompute") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    // plain Recompute is the identity (no materialization)...
    assert(graft.ops.Materialize(df, graft.ops.Materialize.Recompute) eq df)
    // ...but iterative loop state upgrades to Local: lineage must truncate
    // per round or the pointer-jumping self-join's double reference grows
    // the plan exponentially with iterations
    val it = graft.ops.Materialize.iterative(df, graft.ops.Materialize.Recompute)
    assert(!(it eq df))
    assert(it.collect().toSeq == df.collect().toSeq)
  }

  test("GridCursor deferred reads fail loudly after a dense->map migration") {
    // round-5 ADVICE: a cursor slot captured before an out-of-bounds put is
    // stale once the grid migrates to the sparse map (the columnar arrays
    // are nulled). Deferred value reads must throw the documented
    // IllegalStateException, never NPE on the freed backing or silently
    // read the wrong cell. (The kernel never mutates with a live cursor —
    // this pins the contract for future call sites.)
    val (g, _) = graft.core.html.DelimitedText.parse("aa\tbb\ncc\tdd", '\t')
    val cur = g.cursor
    assert(cur.moveTo(0, 1) && cur.value == "bb", "span-backed dense parse")
    // re-position WITHOUT materializing, then migrate via out-of-bounds put
    assert(cur.moveTo(1, 0))
    g.put(graft.core.grid.Cell.str("far", 5000, 5000)) // beyond dense bounds
    val e = intercept[IllegalStateException] { cur.value }
    assert(e.getMessage.contains("migrated"), e.getMessage)
    // a fresh moveTo against the migrated grid reads correctly
    assert(cur.moveTo(1, 0) && cur.value == "cc")
  }

  test("manifest reader falls back to the legacy wall_ms field name") {
    val dir = Files.createTempDirectory("snapguard").toString
    val snaps = Paths.get(dir, "_snapshots")
    Files.createDirectories(snaps)
    // a manifest written by the pre-rename code: wall_ms, no wall_share_ms
    val legacy =
      """{"snapshot_id": 7, "parent_id": -1, "committed": [
        |  {"bucket": 0, "rows": 10, "tables": 2, "parse_failures": 0,
        |   "bytes_stripped": 123, "wall_ms": 456, "snapshot_id": 7,
        |   "files": ["part-0.parquet"]}]}""".stripMargin
    Files.write(snaps.resolve("snap-7.json"), legacy.getBytes(StandardCharsets.UTF_8))
    Files.write(snaps.resolve("current"), "snap-7.json".getBytes(StandardCharsets.UTF_8))
    val m = Snapshots.readCurrent(dir).get
    assert(m.snapshotId == 7L)
    assert(m.committed.head.wallShareMs == 456L, "legacy wall_ms must be read")
    assert(m.committed.head.bytesStripped == 123L)
  }
}
