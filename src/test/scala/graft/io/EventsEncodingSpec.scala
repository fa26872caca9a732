package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Driver-side regression guard for `Tables.events`: the physical encoding
  * of `events.ts` has flipped between parquet TIMESTAMP(NANOS) and
  * TIMESTAMP(MICROS) across testdata generations, and a reader hardcoded to
  * either zeroes every events-family query (round 6). This spec writes BOTH
  * encodings to temp parquet and asserts the reader yields one logical
  * schema — `ts_ns: long` (exact epoch nanos, the DuckDB `epoch_ns(ts)`
  * contract) plus `ts: timestamp` — with identical values either way.
  */
class EventsEncodingSpec extends SparkSpec {

  // Two instants with non-zero sub-millisecond parts; the second exercises
  // nanos that are NOT representable at micro precision (the NANOS file
  // keeps them; `ts` truncates, `ts_ns` must not — on a MICROS file the
  // same instant simply arrives pre-truncated).
  private val microsA = 1700000000123456L
  private val microsB = 1700000300654321L

  private def writeNanosFile(dir: String): Unit = {
    val schema: MessageType = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).as(
        LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.DOUBLE).named("value")
      .named("events")
    val path = new org.apache.hadoop.fs.Path(s"$dir/part-0.parquet")
    val writer = ExampleParquetWriter.builder(path)
      .withType(schema)
      .withConf(new Configuration())
      .build()
    val f = new SimpleGroupFactory(schema)
    // +7 / +9 ns tails: sub-micro precision only a NANOS file can carry
    writer.write(f.newGroup().append("ts", microsA * 1000L + 7L).append("event_id", 1L).append("value", 1.5))
    writer.write(f.newGroup().append("ts", microsB * 1000L + 9L).append("event_id", 2L).append("value", 2.5))
    writer.close()
  }

  private def writeMicrosFile(dir: String, ntz: Boolean): Unit = {
    import spark.implicits._
    val ts =
      if (ntz) timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")
      else timestamp_micros(col("us")).as("ts")
    Seq((microsA, 1L, 1.5), (microsB, 2L, 2.5))
      .toDF("us", "event_id", "value")
      .select(ts, col("event_id"), col("value"))
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  test("events() reads NANOS, MICROS-LTZ and MICROS-NTZ encodings") {
    val root = Files.createTempDirectory("events-enc").toString
    val nanosDir = s"$root/nanos"
    val microsDir = s"$root/micros"
    val ntzDir = s"$root/micros_ntz" // the current testdata encoding
    Files.createDirectories(java.nio.file.Paths.get(s"$nanosDir/events.parquet"))
    writeNanosFile(s"$nanosDir/events.parquet")
    writeMicrosFile(s"$microsDir/events.parquet", ntz = false)
    writeMicrosFile(s"$ntzDir/events.parquet", ntz = true)

    for ((dir, label) <- Seq((nanosDir, "nanos"), (microsDir, "micros"),
                             (ntzDir, "micros_ntz"))) {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts_ns").dataType == LongType, s"[$label] ts_ns type")
      assert(df.schema("ts").dataType == TimestampType, s"[$label] ts type")
      val rows = df.select("event_id", "ts_ns", "value")
        .orderBy("event_id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L), s"[$label] ids")
      // ts_ns agrees with DuckDB epoch_ns(ts) on each encoding: exact nanos
      // from a NANOS file, micros*1000 from a MICROS file.
      val expected =
        if (label == "nanos") Seq(microsA * 1000L + 7L, microsB * 1000L + 9L)
        else Seq(microsA * 1000L, microsB * 1000L) // LTZ and NTZ alike
      assert(rows.map(_.getLong(1)).toSeq == expected, s"[$label] ts_ns values")
      assert(rows.map(_.getDouble(2)).toSeq == Seq(1.5, 2.5), s"[$label] values")
    }

    // The derived micro-precision `ts` agrees across encodings (NANOS tail
    // truncates away), so time-window semantics are encoding-independent.
    val tsN = Tables.events(spark, nanosDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().map(_.getLong(1)).toSeq
    val tsM = Tables.events(spark, microsDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().map(_.getLong(1)).toSeq
    assert(tsN == tsM && tsN == Seq(microsA, microsB))
  }
}
