package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Multimodal, Similarity, TextOps}

/** Correctness of the training-data operators: minhash vs exact jaccard,
  * LSH vs brute-force recall, simhash blocking completeness, text stats.
  */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docsWithDups = {
    import spark.implicits._
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().take(60)
    // inject exact + near duplicates with known ids
    val rows = base.toVector ++ Vector(
      (100001L, base(0)._2), // exact dup of doc 0
      (100002L, base(1)._2 + " extra tail token"), // near dup of doc 1
      (100003L, base(2)._2.replace("e", "e")) // identical content, dup of doc 2
    )
    rows.toDF("doc_id", "text")
  }

  test("exact dedup finds injected duplicates") {
    val df = docsWithDups
    val dups = Dedup.exactDuplicates(df).collect()
    val dupIds = dups.map(_.getLong(0)).toSet
    assert(dupIds.contains(100001L))
    assert(dupIds.contains(100003L))
    assert(!dupIds.contains(100002L), "near-dup must not be an exact dup")
  }

  test("minhash estimates track exact n-gram jaccard") {
    val df = docsWithDups
    val pairs = Dedup.minhashPairs(spark, df, k = 128, bands = 32, threshold = 0.5).collect()
    val byPair = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact duplicate pair must be found with estimate ~1.0
    val exactPair = byPair.find { case ((a, b), _) => b == 100001L || a == 100001L }
    assert(exactPair.isDefined, s"exact dup pair missing from ${byPair.keys}")
    assert(exactPair.get._2 >= 0.99)
    // near-dup estimate within 0.15 of exact jaccard
    import spark.implicits._
    val texts = df.as[(Long, String)].collect().toMap
    byPair.foreach { case ((a, b), est) =>
      val exact = Dedup.ngramJaccard(texts(a), texts(b), 3)
      assert(math.abs(est - exact) < 0.2, s"pair ($a,$b): est $est vs exact $exact")
    }
  }

  test("simhash blocking finds exact duplicates (hamming 0)") {
    val pairs = Dedup.simhashPairs(spark, docsWithDups, maxHamming = 3).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall(_.getAs[Number](2).intValue <= 3))
    assert(pairSet.exists { case (a, b) => b == 100001L }, "exact dup must collide")
  }

  test("LSH near-neighbor pairs are a high-recall subset of brute force") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val lsh = Similarity.lshNearNeighbors(spark, emb, nBits = 8, minCosine = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth over all pairs at the same threshold
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a").cast("array<double>"),
        col("v_b").cast("array<double>")))
      .filter(col("cos") >= 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH pairs must verify against exact cosine")
    if (brute.nonEmpty) {
      val recall = lsh.size.toDouble / brute.size
      info(s"LSH recall at 8 bits: $recall (${lsh.size}/${brute.size})")
      assert(recall >= 0.3, s"recall $recall too low")
    }
  }

  test("brute-force top-k returns k ordered neighbors per query") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.orderBy(col("vec_id")).limit(3)
    val out = Similarity.bruteForceTopK(emb, queries, k = 5).collect()
    assert(out.length == 15)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cosines = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y }, "descending cosine")
    }
  }

  test("token count column matches the Scala-side definition") {
    import spark.implicits._
    val df = Seq("a b  c", "  ", "one", "x\t y \n z w").toDF("text")
    val got = df.select(TextOps.tokenCount(col("text"))).as[Long].collect().toVector
    assert(got == Vector(3L, 0L, 1L, 4L))
  }

  test("language id recovers the dominant languages on stopword-rich text") {
    assert(TextOps.classifyLang("the cat and the dog are in the house with food") == "en")
    assert(TextOps.classifyLang("der hund und die katze sind nicht auf dem tisch") == "de")
    assert(TextOps.classifyLang("le chat et le chien sont dans la maison avec les autres") == "fr")
    assert(TextOps.classifyLang("zzz qqq www") == "und")
  }

  test("multimodal stub pipeline preserves schema and batch error isolation") {
    val media = Multimodal.syntheticMedia(spark, sfDir, limitN = 50)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.feature.length == 16))
    val stats = Multimodal.featureStats(Multimodal.extractFeatures(media)).collect()
    assert(stats.map(_.getString(0)).toSet == Set("audio", "image", "video"))
  }
}
