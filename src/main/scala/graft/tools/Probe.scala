package graft.tools
import org.apache.spark.sql.SparkSession
import graft.spark._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val bad = Seq(
      Page("https://h/1", new java.sql.Timestamp(0), Array[Byte](0x1f.toByte, 0x8b.toByte, 0, 0, 0), "", "en"),
      Page("https://h/2", new java.sql.Timestamp(0), "<table><tr><td>unclosed".getBytes, "", "en"),
      Page("https://h/3", new java.sql.Timestamp(0), null, "", "en"),
      Page("https://h/4", new java.sql.Timestamp(0), Array.fill[Byte](300)(0xff.toByte), "", "en")
    ).toDS()
    val out = Pipeline.extract(spark, bad).collect()
    println("PROBE1 rows=" + out.length + " failed=" + out.count(_.parse_failed) + " detail=" + out.map(e => e.url + ":" + e.parse_failed + ":" + e.n_tables).sorted.mkString(","))
    val dir = java.nio.file.Files.createTempDirectory("probe_snap").toString
    val pages = PageGen.pages(spark, "/root/testdata/sf0.001")
    try { Snapshots.runResumable(spark, pages, dir, buckets=4, failAfterBuckets=2) } catch { case e: Exception => println("PROBE2 injected: " + e.getMessage) }
    val m1 = Snapshots.readCurrent(dir).get
    println("PROBE2 committed after crash=" + m1.committed.map(_.bucket).sorted.mkString(","))
    val (proc, skip) = Snapshots.runResumable(spark, pages, dir, buckets=4)
    println("PROBE2 resume processed=" + proc + " skipped=" + skip)
    val total = Snapshots.readTable(spark, dir).get.count()
    val direct = Pipeline.extract(spark, pages).count()
    println("PROBE2 rows via snapshots=" + total + " direct=" + direct + " lineage_rows=" + Snapshots.lineage(spark, dir).get.count())
    val p1 = Pipeline.extract(spark, pages).select("url","text_sha256").orderBy("url").collect().map(_.toString).mkString("|").hashCode
    val p2 = Pipeline.extract(spark, pages).select("url","text_sha256").orderBy("url").collect().map(_.toString).mkString("|").hashCode
    println("PROBE3 deterministic=" + (p1 == p2))
    spark.stop()
  }
}
