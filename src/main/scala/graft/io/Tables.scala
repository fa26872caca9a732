package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided deterministic test tables
  * (`/root/testdata/sf*`, see TESTDATA.md). At 100 TB these would be
  * partitioned/bucketed parquet or an open table format; the reader layer
  * keeps call sites source-agnostic so only this file changes.
  *
  * All readers return plain scans — filters and projections are applied by
  * callers so Catalyst pushes them into the parquet reader
  * (PushedFilters/ReadSchema), never materialized here.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * cannot read natively; `nanosAsLong` maps it to a raw nanosecond long.
    * We expose both the long (`ts_ns`, exact — matches DuckDB `epoch_ns(ts)`)
    * and a microsecond-truncated proper timestamp column `ts`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
