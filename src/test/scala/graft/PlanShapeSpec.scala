package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity}

/** Physical-plan shape assertions for the scale-critical operators: these
  * pin the EXCHANGE CONTENTS, not just output values, so a regression that
  * keeps results correct but re-amplifies shuffle I/O fails the suite.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** All physical nodes, descending through the AQE wrapper. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
    case _ => p +: p.children.flatMap(nodes)
  }
  private def nodes(df: DataFrame): Seq[SparkPlan] =
    nodes(df.queryExecution.executedPlan)

  test("lshNearNeighbors: the banded candidate exchange carries no vector column") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val df = Similarity.lshNearNeighbors(spark, emb, nBits = 12, nTables = 16,
      minCosine = 0.35)
    val shuffles = nodes(df).collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty, "expected shuffle exchanges in the LSH plan")
    // every exchange keyed by the LSH table/bucket (the nTables-amplified
    // candidate stream) must move only scalar id/bucket columns — the
    // embedding may only cross the wire on the id-keyed re-attach joins
    val bucketShuffles = shuffles.filter(_.outputPartitioning.toString.contains("tbl"))
    assert(bucketShuffles.nonEmpty, "expected the (tbl, bucket, salt) candidate exchange")
    bucketShuffles.foreach { e =>
      val arrays = e.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrays.isEmpty,
        s"candidate exchange must not carry vectors, found: " +
          arrays.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(", "))
    }
  }

  test("lshNearNeighbors output unchanged by the id-only banding (oracle shape)") {
    // value regression guard riding the same computation: pair set and
    // cosines must match the brute-force pairs above the threshold on the
    // candidate-covered set (every returned pair is exactly verified)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = Similarity.lshNearNeighbors(spark, emb, nBits = 12, nTables = 16,
      minCosine = 0.35).collect()
    got.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs are ordered id_a < id_b")
      assert(r.getDouble(2) >= 0.35)
    }
    assert(got.map(r => (r.getLong(0), r.getLong(1))).distinct.length == got.length,
      "pairs are distinct across tables")
  }

  test("keepFirst: one hash exchange, no broadcast, text never shuffles") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = Dedup.keepFirst(docs).select(col("doc_id"), col("lang"), col("n_chars"))
    val all = nodes(df)
    assert(!all.exists(_.isInstanceOf[BroadcastExchangeExec]),
      "keepFirst must not broadcast the loser/keep set (unbounded at scale)")
    val shuffles = all.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.length == 1, s"expected exactly one exchange, got ${shuffles.length}")
    val e = shuffles.head
    assert(e.outputPartitioning.toString.contains("text_hash"),
      s"the one exchange is keyed by the text hash: ${e.outputPartitioning}")
    assert(!e.output.exists(_.name == "text"),
      s"column pruning must drop text below the window exchange: " +
        e.output.map(_.name).mkString(", "))
  }

  test("Auto skew mode picks the documented plan variant (exchange vs none)") {
    import graft.spark.{PageGen, Pipeline}
    val pages = PageGen.pages(spark, sfDir)
    def nShuffles(mode: Pipeline.SkewMode, input: org.apache.spark.sql.Dataset[graft.spark.Page]) =
      nodes(Pipeline.extract(spark, input, numPartitions = 8, skewMode = mode).toDF())
        .count(_.isInstanceOf[ShuffleExchangeExec])
    // well-split input (>= n/2 partitions): Auto adds NO exchange — the one
    // shuffle in the plan is the explicit repartition(8) used to build the
    // fixture. ForceShuffle on the same input adds the salted exchange.
    val wellSplit = pages.repartition(8)
    assert(nShuffles(Pipeline.Auto, wellSplit) == 1,
      "Auto must not re-exchange an already well-split input")
    assert(nShuffles(Pipeline.ForceShuffle, wellSplit) == 2)
    // coarse input (1 partition): Auto inserts the salted exchange
    val coarse = pages.coalesce(1)
    assert(nShuffles(Pipeline.Auto, coarse) == 1,
      "Auto must exchange a too-coarse input")
    assert(nShuffles(Pipeline.NoShuffle, coarse) == 0)
  }

  test("keepFirst equals the anti-join formulation") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val viaWindow = Dedup.keepFirst(docs).select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val losers = Dedup.exactDuplicates(docs).select(col("dup_id"))
    val viaAnti = docs.join(losers, col("doc_id") === col("dup_id"), "left_anti")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(viaWindow.sameElements(viaAnti))
  }
}
