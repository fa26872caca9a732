package graft.io

import org.apache.spark.sql.DataFrame

/** Write-side bucketing — the shuffle-you-pay-once pattern for 100 TB
  * fact tables.
  *
  * A table bucketed on its join/aggregation key is hash-partitioned ON
  * DISK: every later equi-join or groupBy on that key between tables with
  * the same bucket count needs NO exchange at read time (Catalyst proves
  * the output partitioning from the catalog metadata — BucketingSpec
  * asserts the join plan is literally Exchange-free). At cluster scale
  * this converts the recurring cost of shuffling a 100 TB fact table on
  * every query into a one-time cost at ingest, and the per-bucket
  * `sortBy` lets sort-merge joins skip or cheapen their sort.
  *
  * Buckets should be sized so one bucket ≈ one healthy task input
  * (128–512 MB): `buckets ≈ table_bytes / 256 MB`, and joined tables
  * must share the bucket count (or one must divide the other with AQE's
  * bucket coalescing).
  */
object Bucketing {

  /** Save `df` as a catalog parquet table bucketed (and sorted) by
    * `keys` at an explicit `path`, replacing any previous version.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, keys: Seq[String]): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }
}
