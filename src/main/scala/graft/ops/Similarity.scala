package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k with the dot product expressed via the
  * built-in higher-order functions `zip_with` + `aggregate` (whole-stage
  * codegen, no UDF). Scale path: random-hyperplane LSH bucketing so the
  * pairwise work only happens inside buckets — the 100 TB variant of the
  * same query keeps one equality-keyed shuffle and drops the cross join.
  */
object Similarity {

  /** cosine(a, b) as a Column over two array<float/double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(zip_with(a, a, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x))
    val nb = sqrt(aggregate(zip_with(b, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (na * nb))
  }

  /** Brute-force top-k cosine neighbors for a set of query vectors.
    * `queries` is broadcast (small side), the corpus streams — the plan is
    * BroadcastNestedLoopJoin over the corpus scan, i.e. one pass, no
    * shuffle of the big side.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qvec").cast("array<double>"),
        col("cvec").cast("array<double>")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic random hyperplanes: nBits × dim matrix from splitmix64.
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    var s = seed
    @inline def next(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Array.fill(nBits) {
      Array.fill(dim) {
        // uniform in [-1, 1)
        ((next() >>> 11) * 1.1102230246251565e-16) * 2.0 - 1.0
      }
    }
  }

  def lshSignature(vec: Array[Float], planes: Array[Array[Double]]): Int = {
    var sig = 0
    var b = 0
    while (b < planes.length) {
      var dot = 0.0
      val p = planes(b)
      val n = math.min(p.length, vec.length)
      var i = 0
      while (i < n) { dot += p(i) * vec(i); i += 1 }
      if (dot >= 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** LSH-bucketed near-neighbor pairs: bucket on the hyperplane signature,
    * pair within buckets, verify with exact cosine. One shuffle on the
    * bucket key.
    */
  def lshNearNeighbors(spark: SparkSession, corpus: DataFrame, nBits: Int = 12,
      seed: Long = 42L, minCosine: Double = 0.9,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = hyperplanes(nBits, dim, seed)
    val bplanes = spark.sparkContext.broadcast(planes)

    val sigged = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, lshSignature(v, bplanes.value)) }
      .toDF("id", "v", "bucket")

    val a = sigged.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sigged.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("v_a").cast("array<double>"),
        col("v_b").cast("array<double>")), 6))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos"))
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }
}
