package graft.spark

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) table layout for co-located joins — the third
  * leg of the 100 TB join toolkit next to broadcast (small dims) and
  * salting (skew): two tables bucketed on the same key with the same
  * bucket count join WITHOUT any exchange, because each scan already
  * reports `HashPartitioning(bucketCount)` on the join key. On a
  * 1000-executor cluster this turns the repeated "join the crawl corpus
  * with its per-doc annotations" pattern from a full 100 TB shuffle per
  * run into zero shuffle per run, paying one clustered write up front.
  *
  * Uses the native parquet data-source bucketing (Spark's own layout, no
  * Hive dependency); `path` makes the table external so the data outlives
  * the catalog entry.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted table. Sorting within
    * buckets additionally removes the sort from downstream sort-merge
    * joins (the plan keeps SortMergeJoin but both Sort nodes vanish).
    */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    df.write
      .mode(mode)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-key same-count bucketed tables: shuffle-free by
    * construction (asserted in PlanShapeSpec — zero ShuffleExchange nodes
    * in the executed plan).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String)
      : DataFrame =
    spark.table(left).join(spark.table(right), key)
}
