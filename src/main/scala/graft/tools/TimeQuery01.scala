package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQuery01 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
        val n = graft.SparkEntry.queries(name)(s, dir).count()
        println(s"$name $dir rows=$n")
      }
    }
    s.stop()
  }
}
