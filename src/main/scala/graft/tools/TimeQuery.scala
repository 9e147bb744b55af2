package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(s, "/root/testdata/sf0.1").count()
      println(f"$name rows=$n sec=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    s.stop()
  }
}
