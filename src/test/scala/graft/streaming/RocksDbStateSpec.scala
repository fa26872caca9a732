package graft.streaming

import java.sql.Timestamp

import graft.{GraftSession, SparkSpec}
import graft.model.FlowStat
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The detection state machines must produce identical alerts on the
  * RocksDB state store provider (the 100 TB-state configuration — bounded
  * heap, SSD-backed keys) as on the default in-heap provider, and the
  * provider must verifiably be RocksDB, not a silent fallback.
  */
class RocksDbStateSpec extends SparkSpec {

  private val T0 = Timestamp.valueOf("2026-01-01 00:00:00")

  private def flow(pollId: Long, src: String, dst: String, pc: Long,
                   tcpDst: Option[Int] = Some(23), udp: Option[Int] = None): FlowStat =
    FlowStat(T0, pollId, "d0", 1L, 10, 1, None, None, Some(src), Some(dst),
      Some(if (udp.isDefined) 17 else 6), None, tcpDst, udp, udp, 2, pc, pc * 100)

  private val polls = Seq(
    Seq(flow(1, "10.0.0.4", "10.0.0.5", 300),
      flow(1, "10.0.0.1", "10.0.0.8", 50, tcpDst = None, udp = Some(48101)),
      flow(1, "10.0.0.1", "10.0.0.8", 50)),
    Seq(flow(2, "10.0.0.4", "10.0.0.5", 600),
      flow(2, "10.0.0.2", "10.0.0.8", 100, tcpDst = None, udp = Some(48101)),
      flow(2, "10.0.0.2", "10.0.0.8", 100)))

  private def runAlerts(): (Set[(String, String)], String) = {
    import spark.implicits._
    val in = MemoryStream[FlowStat](spark)
    val q = DetectionStream.alerts(in.toDS()).writeStream
      .format("memory").queryName("rocks_alerts").outputMode("update").start()
    polls.foreach { p => in.addData(p); q.processAllAvailable() }
    val progress = q.lastProgress.json
    q.stop()
    val got = spark.table("rocks_alerts").as[DetectionStream.DomainAlert]
      .collect().map(a => (a.ip, a.label)).toSet
    spark.sql("DROP VIEW IF EXISTS rocks_alerts")
    (got, progress)
  }

  test("selectStateStore picks RocksDB at large cardinality, in-heap below") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      DetectionStream.selectStateStore(spark, DetectionStream.LargeStateRowThreshold)
      assert(spark.conf.get(key).contains("RocksDB"))
      DetectionStream.selectStateStore(spark, DetectionStream.LargeStateRowThreshold - 1)
      assert(spark.conf.get(key).contains("HDFSBacked"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }

  test("alerts identical on RocksDB and default providers; RocksDB really engaged") {
    val (onHeap, heapProgress) = runAlerts()
    assert(!heapProgress.contains("rocksdb"), "baseline run must use the default provider")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      GraftSession.useRocksDbState(spark)
      val (onRocks, progress) = runAlerts()
      assert(onRocks == onHeap)
      assert(onHeap.nonEmpty)
      // the state operator's custom metrics are provider-specific: their
      // presence proves RocksDB served the state, not the in-heap map
      assert(progress.contains("rocksdb"), s"expected rocksdb metrics in: $progress")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }
}
