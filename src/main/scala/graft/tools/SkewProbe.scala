package graft.tools
import org.apache.spark.sql.SparkSession
import graft.spark._
object SkewProbe {
  def main(args: Array[String]): Unit = {
    Seq(8, 4, 8, 32, 8).foreach { p =>
      val s = SparkSession.builder().master(s"local[$p]")
        .config("spark.sql.shuffle.partitions", p.toString)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.local.dir", "/dev/shm/graft-spark-local")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      import s.implicits._
      val pages = s.read.parquet("/dev/shm/graft_corpus").as[Page]
      val inParts = pages.queryExecution.toRdd.getNumPartitions
      Pipeline.extract(s, pages.sample(withReplacement=false, 0.05, 42L), numPartitions = p*2).count()
      val t0 = System.nanoTime()
      val n = Pipeline.extract(s, pages, numPartitions = p*2).filter(!_.parse_failed).count()
      println(f"p=$p%2d inParts=$inParts wall=${(System.nanoTime()-t0)/1e9}%6.2f rows=$n")
      s.stop()
    }
  }
}
