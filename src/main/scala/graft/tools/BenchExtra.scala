package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.spark.{PageGen, Pipeline}

/** Extra benchmarks (guide §1.4): noop-sink isolation of the extraction
  * pipeline's pieces and of the heaviest map stages, so per-query seconds
  * decompose into generation / shuffle / kernel / rollup instead of one
  * opaque number. NOT part of the frozen Bench surface — cite the numbers
  * in OPTIMIZATION_r08.md.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
    })
    def drain(): Unit = {
      var prev = -1L; var cur = cpuNs.get(); var spins = 0
      while (cur != prev && spins < 200) { Thread.sleep(25); prev = cur; cur = cpuNs.get(); spins += 1 }
    }
    def noop(name: String, df: => DataFrame): Unit = {
      // one warm pass absorbs JIT/codegen, then 2 timed noop-sink passes
      df.write.format("noop").mode("overwrite").save()
      (1 to 2).foreach { rep =>
        drain(); cpuNs.set(0L)
        spark.sparkContext.setJobDescription(s"$name rep$rep")
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        drain()
        println(f"BENCHEXTRA $name%-28s rep$rep wall=$dt%6.2fs cpu=${cpuNs.get() / 1e9}%6.2fs")
      }
    }

    import org.apache.spark.sql.functions._
    import spark.implicits._
    def pages = PageGen.pages(spark, sfDir)
    noop("pages_gen", pages.toDF())
    noop("extract_agg_plain", Pipeline.extract(spark, pages).toDF().agg(
      count(lit(1)).as("docs"), sum(col("n_tables")).as("t")))
    noop("extract_agg_pruned", Pipeline.extract(spark, pages).toDF()
      .select("url", "n_tables", "n_regions", "bytes_stripped", "parse_failed")
      .groupBy(pmod(xxhash64(col("url")), lit(32)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tables")).as("t")))
    noop("extract_metrics_nosort",
      Pipeline.extract(spark, pages).toDF()
        .groupBy(pmod(xxhash64(col("url")), lit(32)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("docs"), sum(col("n_tables")).as("t")))
    noop("extract_noshuffle",
      Pipeline.extract(spark, pages, skewMode = Pipeline.NoShuffle).toDF())
    noop("extract_auto", Pipeline.extract(spark, pages).toDF())
    noop("extract_metrics", Pipeline.metrics(Pipeline.extract(spark, pages)))
    noop("extract_tables",
      Pipeline.extract(spark, pages,
        graft.core.detect.DetectConfig(extractTables = true)).toDF())
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    noop("passage_fps", graft.ops.Dedup.passageFingerprints(docs, w = 25))
    noop("minhash_sigs", docs.select(
      graft.functions.DedupFunctions.minhashSig(
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.col("text"),
          org.apache.spark.sql.functions.lit("")), 64, 3).as("sig")))
    spark.stop()
  }
}
