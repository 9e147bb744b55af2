package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark._
import graft.core.detect.DetectConfig
object StageBench {
  def session(p: Int) = {
    val s = SparkSession.builder().master(s"local[$p]")
      .config("spark.sql.shuffle.partitions", p.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }
  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    Seq(8, 32, 8, 32).foreach { p =>
      val s = session(p)
      import s.implicits._
      def timed(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime(); val n = f
        println(f"p=$p%2d $name%-22s wall=${(System.nanoTime()-t0)/1e9}%6.2f rows=$n")
      }
      val pages = s.read.parquet(corpus).as[Page]
      timed("scan_only")(s.read.parquet(corpus).select(sum(length(col("html")))).count())
      timed("scan_shuffle")(Pipeline.withSkewKey(pages).repartition(p*2, col("_host"), col("_salt"), col("_szbin")).select(count(lit(1))).as[Long].head())
      timed("kernel_noshuffle") {
        val cfg = DetectConfig()
        pages.mapPartitions(it => it.map(pg => Pipeline.extractOne(pg, cfg, 0))).filter(!_.parse_failed).count()
      }
      timed("full_pipeline")(Pipeline.extract(s, pages, numPartitions = p*2).filter(!_.parse_failed).count())
      s.stop()
    }
  }
}
