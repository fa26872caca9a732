package graft.fixtures

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-cliff probe data: a 10x replication of a source SF's `documents`
  * and `embeddings` tables, built so per-query OUTPUT grows linearly —
  * which is what makes superlinear RUNTIME growth attributable to the
  * plan, not the workload:
  *
  *  - documents: replica r > 0 suffixes every token with `~r`, so token
  *    and shingle vocabularies of different replicas are DISJOINT — each
  *    replica reproduces the source corpus's near-dup structure exactly,
  *    and no cross-replica near-dup pairs exist (a plain copy would add
  *    ~45 bogus pairs per source doc and grow pair output quadratically).
  *  - embeddings: replica r rotates the vector by r positions (norms and
  *    within-replica cosines preserved) and offsets the block label, so
  *    blocked-pair output is exactly 10x and ANN queries (vec_id < 8,
  *    replica 0 only) search a genuinely 10x corpus.
  *  - events: ids and user ids offset per replica but event_type KEPT — the
  *    5 hot keys each grow 10x, which is exactly the regime the skew
  *    rewrites (k-queries) must stay linear in.
  */
object ScaleProbe {

  val Replicas = 10
  val IdStride = 10000000L

  /** Standalone generation (Bench generates lazily; this lets QueryProbe
    * sessions reuse the same dir): `tools/run.sh graft.fixtures.ScaleProbe
    * [srcDir] [outDir]`.
    */
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1)
              else new java.io.File("target/sf1").getAbsolutePath
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "scale-probe-gen")
    spark.sparkContext.setLogLevel("WARN")
    ensure(spark, src, out)
    println(s"probe data at $out (src $src)")
    spark.stop()
  }

  /** Generate into `outDir` unless already generated from this `srcDir`.
    * (The events check upgrades probe dirs generated before events were
    * part of the probe.)
    */
  def ensure(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val marker = Paths.get(outDir, "_PROBE_SRC")
    if (Files.exists(marker) && new String(Files.readAllBytes(marker)) == srcDir
        && Files.exists(Paths.get(outDir, "events.parquet"))) return
    val reps = spark.range(Replicas).select(col("id").cast("int").as("r"))

    spark.read.parquet(s"$srcDir/documents.parquet")
      .crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("r") * IdStride).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1~"), col("r").cast("string"))))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      // multi-file output like any real corpus: a single small parquet
      // file is one row group, i.e. a 1-task scan
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    spark.read.parquet(s"$srcDir/embeddings.parquet")
      .crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("r") * IdStride).as("vec_id"),
        concat(
          slice(col("embedding"), col("r") + 1, lit(64) - col("r")),
          slice(col("embedding"), lit(1), col("r"))).as("embedding"),
        (col("label") + col("r") * 1000).as("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    spark.read.parquet(s"$srcDir/events.parquet")
      .crossJoin(broadcast(reps))
      .select(
        (col("event_id") + col("r") * IdStride).as("event_id"),
        col("ts"),
        (col("user_id") + col("r") * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    Files.write(marker, srcDir.getBytes)
    ()
  }
}
