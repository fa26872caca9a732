package graft.dipa

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.PacketEvent
import org.apache.spark.sql.functions._

/** §3.3 flow-install pipeline: LLDP drop, MAC learning, FLOOD fallback,
  * classification (incl. C7 triggers), and rule emission.
  */
class FlowInstallSpec extends SparkSpec {

  import spark.implicits._

  private val T0 = Timestamp.valueOf("2026-01-01 00:00:00")

  private def pkt(dpid: Long, inPort: Int, src: String, dst: String,
                  ethertype: Int = 0x0800, proto: Option[Int] = Some(6),
                  dstPort: Option[Int] = Some(80), buf: Long = 0): PacketEvent =
    PacketEvent(T0, "vm0", dpid, inPort, src, dst, ethertype,
      Some("10.0.0.1"), Some("10.0.0.2"), proto, Some(1024), dstPort, buf)

  private val history = Seq(
    pkt(1, 1, "aa", "bb", buf = 0),               // learn aa@1
    pkt(1, 2, "bb", "aa", buf = 1),               // learn bb@2
    pkt(1, 3, "aa", "bb", buf = 2),               // aa moves to 3
    pkt(1, 9, "cc", "dd", ethertype = 0x88cc, buf = 3)) // LLDP: never learned

  test("learnedMacs: last-write-wins, LLDP excluded") {
    val t = FlowInstall.learnedMacs(history.toDF())
      .collect().map(r => r.getAs[String]("mac") -> r.getAs[Int]("learned_port")).toMap
    assert(t == Map("aa" -> 3, "bb" -> 2))
  }

  test("install: known dst forwards, unknown dst floods, LLDP dropped") {
    val rules = FlowInstall.install(history.toDF()).collect()
    assert(rules.forall(_.getAs[String]("eth_src") != "cc")) // LLDP row gone
    val byBuf = FlowInstall.install(history.toDF())
    val toBb = byBuf.filter(col("eth_dst") === "bb").select("out_port")
      .distinct().as[Int].collect().toSeq
    assert(toBb == Seq(2)) // learned port
    val flood = FlowInstall.install((history :+ pkt(1, 1, "aa", "zz", buf = 4)).toDF())
      .filter(col("eth_dst") === "zz").select("out_port").as[Int].head()
    assert(flood == FlowInstall.FloodPort)
  }

  test("install: Unknown protocol gets no rule; C7 trigger widens the match") {
    val odd = pkt(1, 1, "aa", "bb", proto = Some(99), dstPort = Some(4444), buf = 5)
    val none = FlowInstall.install((history :+ odd).toDF())
      .filter(col("eth_src") === "aa" && col("dpid") === 1 && col("in_port") === 1)
      .filter(col("protocol") === "Unknown").count()
    assert(none == 0)
    // protoTrig "6" (a consumed collaboration alert) makes ip_proto 99 classify as TCP
    val trigRules = FlowInstall.install((history :+ odd).toDF(), protoTrig = Some("6"))
      .filter(col("protocol") === "TCP").count()
    assert(trigRules >= 1)
  }

  test("streaming MAC learning emits on first sight and on moves only") {
    val entries = FlowInstall.macStream(history.toDS()).collect()
      .sortBy(_.seq).map(e => (e.mac, e.port))
    assert(entries.toSeq == Seq(("aa", 1), ("bb", 2), ("aa", 3)))
  }
}
