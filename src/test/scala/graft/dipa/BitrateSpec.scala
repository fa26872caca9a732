package graft.dipa

import java.sql.Timestamp

import graft.SparkSpec
import graft.fixtures.Fixtures
import graft.model.FlowStat
import org.apache.spark.sql.functions._

/** TC2 bitrate detector: rates, victim detection, attacker attribution
  * with the topology MAC/IP zip, pushback, and the peace check.
  */
class BitrateSpec extends SparkSpec {

  import spark.implicits._

  private val T0 = Timestamp.valueOf("2026-01-01 00:00:00")

  // two polls, 2 s apart: attacker 10.0.0.1 (s3 port 1) floods victim
  // 10.0.0.7; benign 10.0.0.5 -> 10.0.0.7 trickle; cross-domain flood
  // toward 10.0.0.8 arrives on an inter-switch port (no host attached)
  private def f(pollId: Long, dpid: Long, inPort: Int, src: String, dst: String,
                bytes: Long): FlowStat =
    FlowStat(T0, pollId, "vm0", dpid, 10, inPort, None, Some(s"m-$dst"),
      Some(src), Some(dst), Some(6), Some(1024), Some(80), None, None, 2, bytes / 100, bytes)

  private val flows = Seq(
    f(0, 3, 1, "10.0.0.1", "10.0.0.7", 0),
    f(1, 3, 1, "10.0.0.1", "10.0.0.7", 5000000),  // 20 Mbit/s over 2 s
    f(0, 6, 1, "10.0.0.5", "10.0.0.7", 0),
    f(1, 6, 1, "10.0.0.5", "10.0.0.7", 10000),    // 40 Kbit/s
    f(0, 7, 9, "99.9.9.9", "10.0.0.8", 0),
    f(1, 7, 9, "99.9.9.9", "10.0.0.8", 9000000))  // foreign flood, port 9 = trunk

  private lazy val topo = Fixtures.topology(8).toDF()
  private lazy val rates = Bitrate.flowRates(flows.toDF(), intervalS = 2.0)

  test("O6: Kbit/s from cumulative byte deltas") {
    val k = rates.filter(col("poll_id") === 1 && col("ipv4_src") === "10.0.0.1")
      .select("kbps").as[Double].head()
    assert(math.abs(k - 5000000 * 8 / 2000.0) < 1e-9) // 20000 kbps
  }

  test("victims: inbound sum over threshold on the latest poll") {
    val v = Bitrate.victims(rates, bitrateThresholdKbps = 1000.0)
      .select("ipv4_dst").as[String].collect().toSet
    assert(v == Set("10.0.0.7", "10.0.0.8")) // benign trickle alone never qualifies
  }

  test("J4/J5: attribution resolves attacker hosts through the topology zip") {
    val v = Bitrate.victims(rates, 1000.0)
    val a = Bitrate.attackers(rates, v, topo, attackerThresholdKbps = 1000.0).collect()
    assert(a.length == 1) // the foreign flood enters on a trunk port: no host row
    val r = a.head
    assert(r.getAs[String]("attacker_ip") == "10.0.0.1")
    assert(r.getAs[String]("switch_name") == "s3" && r.getAs[Int]("port") == 1)
    assert(r.getAs[String]("victim_ip") == "10.0.0.7")
  }

  test("J7: pushback = victims with no locally-attached attacker") {
    val v = Bitrate.victims(rates, 1000.0)
    val a = Bitrate.attackers(rates, v, topo, 1000.0)
    val p = Bitrate.pushback(v, a).select("ipv4_dst").as[String].collect().toSeq
    assert(p == Seq("10.0.0.8")) // the cross-domain flood needs upstream help
  }

  test("A8: per-port peace check feeds the ingress machine") {
    val peace = Bitrate.portPeace(rates, peaceThresholdKbps = 100.0)
      .collect().map(r => (r.getAs[Long]("dpid"), r.getAs[Boolean]("at_peace"))).toMap
    assert(peace == Map(3L -> false, 6L -> true, 7L -> false))
  }
}
