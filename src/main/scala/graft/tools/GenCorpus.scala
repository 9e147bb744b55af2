package graft.tools
import org.apache.spark.sql.SparkSession
import graft.spark.PageGen
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, out, amp) = args
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    PageGen.pages(s, sfDir, amp.toInt).repartition(128).write.mode("overwrite").parquet(out)
    println("rows=" + s.read.parquet(out).count())
    s.stop()
  }
}
