package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A prebuilt IVF (inverted-file) ANN index: the trained centroid matrix
  * plus the assigned corpus — (neighbor_id long, cvec array<float>,
  * cell int), one row per vector with its nearest-centroid cell id.
  *
  * This is the FAISS train-once / add-many shape: centroids are trained
  * ONCE on a bounded sample and then frozen; new vectors are assigned
  * map-side against the frozen centroids ([[Similarity.assignVectors]])
  * and appended — retraining is an explicit rebuild, never an implicit
  * side effect of ingest. A search from a loaded index plans NO
  * assignment expression over the corpus at all (the cell ids are data);
  * only the (tiny) query set pays the probe computation at search time.
  */
final case class IvfIndex(
    centroids: Array[Array[Double]],
    assigned: DataFrame,
    nList: Int) {
  require(centroids.nonEmpty, "IvfIndex needs at least one centroid")
}

/** Parquet persistence for [[IvfIndex]] with the same commit discipline as
  * [[MinhashIndex]]: data directories land first, the `index.json`
  * manifest ATOMIC_MOVE is the commit point, and assigned-segment appends
  * are idempotent under the segment name. Centroids are stored as parquet
  * rows (cell, vec array<double>) — bit-exact doubles, no text round-trip.
  */
object IvfIndex {

  private val mapper = new ObjectMapper()

  final case class Meta(nList: Int, segments: Seq[String])

  private def manifestPath(dir: String) = Paths.get(dir, "index.json")

  def readMeta(dir: String): Meta = {
    val p = manifestPath(dir)
    require(Files.exists(p), s"no IvfIndex manifest at $p")
    val root = mapper.readTree(Files.readAllBytes(p))
    Meta(root.get("n_list").asInt(),
      root.get("segments").elements().asScala.map(_.asText()).toSeq)
  }

  private def commitManifest(dir: String, nList: Int, segments: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val root = mapper.createObjectNode()
    root.put("format", 1)
    root.put("n_list", nList)
    val arr = root.putArray("segments")
    segments.foreach(arr.add)
    val tmp = Paths.get(dir, ".index.json.tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeAssigned(assigned: DataFrame, dir: String, segment: String): Unit =
    assigned.select("neighbor_id", "cvec", "cell").write.mode("overwrite")
      .parquet(s"$dir/assigned/$segment")

  /** Write a fresh index (centroids + assigned segment `base`), replacing
    * any manifest already at `dir`.
    */
  def write(idx: IvfIndex, dir: String): Unit = {
    val spark = idx.assigned.sparkSession
    import spark.implicits._
    idx.centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cell", "vec")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    writeAssigned(idx.assigned, dir, "base")
    commitManifest(dir, idx.nList, Seq("base"))
  }

  /** Append an assigned-vector delta idempotently (the add() step of a
    * growing ANN corpus): returns false without touching anything when
    * `segment` is already committed. The delta must be assigned against
    * THIS index's centroids ([[Similarity.assignVectors]] on a loaded
    * index) — cell ids from different centroids are not comparable, which
    * is also why centroids are immutable here.
    */
  def appendSegment(delta: DataFrame, dir: String, segment: String): Boolean = {
    require(segment.nonEmpty && segment.forall(c =>
        c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"segment name '$segment' must be a plain file-name token")
    val m = readMeta(dir)
    if (m.segments.contains(segment)) return false
    writeAssigned(delta, dir, segment)
    commitManifest(dir, m.nList, m.segments :+ segment)
    true
  }

  /** Load the committed index: centroids into the driver-side matrix (it
    * rides search plans as a codegen reference object), assigned as a
    * plain parquet scan of the manifest-listed segments.
    */
  def load(spark: SparkSession, dir: String): IvfIndex = {
    val m = readMeta(dir)
    require(m.segments.nonEmpty, s"IvfIndex at $dir has no committed segments")
    val cents = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    // trainCentroids emits min(nList, sample size) centroids, never more
    require(cents.length <= m.nList,
      s"centroid count ${cents.length} exceeds n_list ${m.nList}")
    val assigned = spark.read.parquet(m.segments.map(s => s"$dir/assigned/$s"): _*)
    IvfIndex(cents, assigned, m.nList)
  }
}
