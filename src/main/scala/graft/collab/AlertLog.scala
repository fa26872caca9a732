package graft.collab

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}

/** File-backed commit log with EXPLICIT offsets — the S5/S6 transport when
  * no broker is deployed. The reference's collaboration plane is Pulsar
  * topics with shared subscriptions and consumer acks
  * (`ryu/src/deployed_controller/DIPA_Controller.py:67-80, 357-421`); this
  * adapter reproduces the log contract those give you, with Spark's
  * file-stream source as the consumer group:
  *
  *  - One immutable segment file per publish, named
  *    `<base-offset 020d>-<count>.seg`, holding `offset<TAB>frame` lines.
  *    Offsets are contiguous: a segment's base = previous base + count.
  *  - Atomic publish: segments are written under an `_`-prefixed temp name
  *    (hidden from Spark's file source) and ATOMIC_MOVEd into place — a
  *    reader never observes a partial segment.
  *  - Consumption position: Spark's file-stream source checkpoints which
  *    segment files each query has processed (its WAL under
  *    `checkpointLocation`), so a restarted consumer resumes at the first
  *    unread segment — the committed-offset analog.
  *  - Delivery is AT-LEAST-ONCE end-to-end: a producer that dies after
  *    append but before its own ack bookkeeping re-appends the same frame
  *    at a fresh offset. Effectively-once is the consumer's job — exactly
  *    as with Pulsar acks — and `DetectionStream.mitigations`'
  *    `dropDuplicates` keyed state provides it (checkpointed, so it
  *    survives consumer restarts). CollabSpec drives both properties.
  *
  * One log directory = one totally-ordered partition (matching one Pulsar
  * topic per domain, `alert<domain>`); a real broker connector replaces
  * exactly this object and nothing downstream.
  */
object AlertLog {

  val Schema = "offset LONG, value STRING"

  private def isSeg(p: Path): Boolean = p.getFileName.toString.endsWith(".seg")

  private def baseAndCount(p: Path): (Long, Long) = {
    val Array(b, c) = p.getFileName.toString.stripSuffix(".seg").split('-')
    (b.toLong, c.toLong)
  }

  /** The offset the next appended frame will get (= total frames ever). */
  def nextOffset(dir: String): Long = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) 0L
    else {
      val s = Files.list(d)
      try s.iterator().asScala.filter(isSeg)
        .map { p => val (b, c) = baseAndCount(p); b + c }
        .foldLeft(0L)(math.max)
      finally s.close()
    }
  }

  /** Append frames as one atomically-published segment; returns the base
    * offset. Frames must be single-line and tab-free (the wire codec's
    * `@`-joined strings are — `graft.dipa.Codec`).
    *
    * Publication is a hard LINK, not a rename: `Files.createLink` fails
    * atomically if the target exists, whereas `ATOMIC_MOVE` on Linux
    * silently REPLACES it — so two producers racing to the same base
    * offset (the single-writer constraint violated) now surface as an
    * `IllegalStateException` on the loser instead of one producer's
    * frames vanishing. The linked file is fully written before it becomes
    * visible, so readers still never observe a partial segment.
    */
  def append(dir: String, frames: Seq[String]): Long =
    publish(dir, nextOffset(dir), frames)

  /** [[append]] at an explicit base offset — the claim-or-fail step,
    * separated so the lost-the-race arm (a stale base) is testable.
    */
  private[collab] def publish(dir: String, base: Long, frames: Seq[String]): Long = {
    require(frames.nonEmpty, "empty publish")
    require(frames.forall(f => !f.contains('\t') && !f.contains('\n') && !f.contains('\r')),
      "wire frames must be single-line and tab-free")
    val d = Files.createDirectories(Paths.get(dir))
    val name = f"$base%020d-${frames.size}.seg"
    val tmp = d.resolve("_" + name + ".tmp")
    val lines = frames.zipWithIndex.map { case (v, i) => s"${base + i}\t$v" }
    Files.write(tmp, lines.asJava)
    try Files.createLink(d.resolve(name), tmp)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"concurrent producer collision on $dir at base offset $base — " +
            "one log directory is one totally-ordered partition with a " +
            "single writer; route concurrent publishers through one sink",
          e)
    }
    Files.delete(tmp)
    base
  }

  /** Tail the log as a stream of (offset, value). Quote handling is
    * disabled: frames are opaque single-line strings, not CSV. Creates
    * the directory so a consumer may subscribe before the first publish.
    */
  def stream(spark: SparkSession, dir: String): DataFrame = {
    Files.createDirectories(Paths.get(dir))
    spark.readStream.schema(Schema)
      .option("sep", "\t").option("quote", "")
      .csv(s"$dir/*.seg")
  }

  /** Batch replay of the whole log (audits, backfills, tests). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    Files.createDirectories(Paths.get(dir))
    spark.read.schema(Schema)
      .option("sep", "\t").option("quote", "")
      .csv(s"$dir/*.seg")
  }

  /** `foreachBatch` producer hook: publish a wire frame batch (column
    * `value`) as one segment. The collect is the single-writer append a
    * log partition requires (the broker's leader role); per-executor
    * appends would race on offsets. Frames are sorted for deterministic
    * offsets under Spark's nondeterministic row order.
    */
  def sink(dir: String): (Dataset[Row], Long) => Unit = (batch, _) => {
    val frames = batch.select("value").as[String](Encoders.STRING)
      .collect().toSeq.sorted
    if (frames.nonEmpty) { append(dir, frames); () }
  }
}
