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
    intercept[IllegalArgumentException] { Dedup.bandHashesOf(Array.emptyLongArray, 16) }
    assert(Dedup.bandHashesOf(new Array[Long](64), 16).length == 16)
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
