package graft.collab

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The collaboration-plane transport contract — the seam where the
  * reference's Pulsar client sits (`ryu/src/deployed_controller/
  * DIPA_Controller.py:67-80` producer/consumer setup, `:357-421` the
  * consume loop). Everything downstream (Collab.consume, the mitigation
  * pipeline, the C7 ClassifierLoop) sees only (offset, value) frames, so
  * swapping transports never touches query logic.
  *
  *  - `stream`: subscribe from the last checkpointed position (Spark
  *    checkpoints the source progress per query — the committed-offset /
  *    Pulsar-ack analog).
  *  - `sink`: a `foreachBatch` publish hook. Delivery is AT-LEAST-ONCE
  *    end-to-end on every transport; effectively-once remains the
  *    consumer's `dropDuplicates` keyed state, exactly as with broker
  *    acks (CollabSpec drives redelivery + checkpoint restart).
  */
trait LogTransport {
  /** Tail the log as a streaming (offset LONG, value STRING) frame. */
  def stream(spark: SparkSession): DataFrame
  /** Batch replay of everything retained (audits, backfills, tests). */
  def read(spark: SparkSession): DataFrame
  /** `foreachBatch` producer hook publishing the `value` column. */
  def sink: (Dataset[Row], Long) => Unit
}

/** The file-backed transport: [[AlertLog]] behind the contract. Runs
  * everywhere (no broker), totally ordered per directory, used by the
  * transport-contract tests.
  */
final case class FileLog(dir: String) extends LogTransport {
  def stream(spark: SparkSession): DataFrame = AlertLog.stream(spark, dir)
  def read(spark: SparkSession): DataFrame = AlertLog.read(spark, dir)
  def sink: (Dataset[Row], Long) => Unit = AlertLog.sink(dir)
}

/** The Kafka transport: one topic per domain (`alert<domain>` — the
  * reference's topic naming), Spark's kafka source/sink as consumer and
  * producer. The option mapping below is the entire adapter; the
  * (offset, value) schema and at-least-once semantics line up with
  * [[FileLog]] by construction (Kafka partition offsets ↔ segment
  * offsets; producer retries ↔ segment re-append).
  *
  * NOT RUNNABLE IN THIS BUILD ENVIRONMENT: the spark-sql-kafka connector
  * jar and a broker are both absent (offline container), so
  * `format("kafka")` would fail source lookup at start. The pure option
  * builders are unit-tested; the streaming contract (duplicate
  * redelivery, checkpoint restart, C6 dispatch) is exercised against
  * [[FileLog]] through the same trait — point `bootstrap` at a real
  * cluster with the connector on the classpath and the same queries run
  * unchanged.
  */
final case class KafkaLog(bootstrap: String, topic: String) extends LogTransport {

  /** Consumer options: subscribe from the earliest retained offset; the
    * query's checkpoint, not the broker group, owns progress (Spark's
    * kafka source manages offsets itself — groupIdPrefix only labels it).
    */
  def readerOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "startingOffsets" -> "earliest",
    "groupIdPrefix" -> s"graft-$topic")

  /** Producer options: idempotent producer + all-replica acks — the
    * at-least-once (not at-most-once) arm of the delivery contract.
    */
  def writerOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "topic" -> topic,
    "kafka.enable.idempotence" -> "true",
    "kafka.acks" -> "all")

  def stream(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka").options(readerOptions).load()
      .select(col("offset"), col("value").cast("string").as("value"))

  def read(spark: SparkSession): DataFrame =
    spark.read.format("kafka").options(readerOptions - "groupIdPrefix").load()
      .select(col("offset"), col("value").cast("string").as("value"))

  def sink: (Dataset[Row], Long) => Unit = (batch, _) =>
    batch.select(col("value").cast("binary").as("value"))
      .write.format("kafka").options(writerOptions).save()
}
