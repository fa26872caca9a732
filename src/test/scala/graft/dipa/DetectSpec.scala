package graft.dipa

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.{FlowStat, TopologyEntry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-scenario test of the flagship detection pipeline (SURVEY.md §3.1,
  * `DIPA_Controller.py:452-501 + 323-352`): a seeded Mirai-shaped poll
  * sequence — one CNC dominating telnet traffic, two loaded bots, benign
  * hosts — must elect the right CNC, score the bots >= 0.6, and leave the
  * benign hosts unflagged.
  */
class DetectSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  /** flow(src→dst): telnet (tcp 23) unless ports given. */
  private def flow(poll: Long, src: String, dst: String, pkts: Long,
                   prio: Int = 10, tcpDst: Option[Int] = Some(23),
                   udpSrc: Option[Int] = None, udpDst: Option[Int] = None): FlowStat =
    FlowStat(ts(poll * 2), poll, "d1", 1L, prio, 1, Some("aa:" + src), Some("aa:" + dst),
      Some(src), Some(dst), Some(if (tcpDst.isDefined) 6 else 17),
      None, tcpDst, udpSrc, udpDst, 2, pkts, pkts * 100)

  // Scenario: 10.0.0.4 is the CNC (talks telnet to everyone, huge volume);
  // .1 and .2 are bots (48101-loaded, small telnet traffic); .3 benign
  // telnet chatter but NOT 48101-flagged; .5 non-telnet only.
  private lazy val flows: DataFrame = Seq(
    // poll 1 snapshots
    flow(1, "10.0.0.4", "10.0.0.1", 500), flow(1, "10.0.0.4", "10.0.0.2", 450),
    flow(1, "10.0.0.1", "10.0.0.9", 10), flow(1, "10.0.0.2", "10.0.0.9", 12),
    flow(1, "10.0.0.3", "10.0.0.9", 14),
    // poll 2 — counters grow (cumulative, like OpenFlow counters)
    flow(2, "10.0.0.4", "10.0.0.1", 900), flow(2, "10.0.0.4", "10.0.0.2", 800),
    flow(2, "10.0.0.1", "10.0.0.9", 30), flow(2, "10.0.0.2", "10.0.0.9", 25),
    flow(2, "10.0.0.3", "10.0.0.9", 20),
    // 48101 loading traffic flags .1 and .2 (udp symmetric)
    flow(2, "10.0.0.1", "10.0.0.7", 5, tcpDst = None, udpSrc = Some(48101), udpDst = Some(48101)),
    flow(2, "10.0.0.2", "10.0.0.7", 5, tcpDst = None, udpSrc = Some(48101), udpDst = Some(48101)),
    // a priority-100 block rule that must be ignored by detection
    flow(2, "10.0.0.6", "10.0.0.9", 99999, prio = 100),
    // udp flow from .5 (never telnet): must not appear in telnet totals
    flow(2, "10.0.0.5", "10.0.0.9", 77, tcpDst = None, udpSrc = Some(1000), udpDst = Some(2000))
  ).toDF()

  private lazy val topo: DataFrame = Seq(
    TopologyEntry("s1", 1L, 1, "10.0.0.1", is_host = true),
    TopologyEntry("s1", 1L, 2, "10.0.0.2", is_host = true),
    TopologyEntry("s1", 1L, 3, "10.0.0.3", is_host = true),
    TopologyEntry("s1", 1L, 4, "10.0.0.4", is_host = true),
    TopologyEntry("s1", 1L, 5, "s2", is_host = false)
  ).toDF()

  test("telnetTotals sums the last-seen counter per (src,dst), telnet only, data flows only") {
    val totals = Detect.telnetTotals(flows).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    // last snapshot per (src,dst): .4 → 900+800; .1 → 30; .2 → 25; .3 → 20
    assert(totals == Map("10.0.0.4" -> 1700L, "10.0.0.1" -> 30L,
      "10.0.0.2" -> 25L, "10.0.0.3" -> 20L))
    // the pri-100 rule (.6) and the pure-udp host (.5) are absent
    assert(!totals.contains("10.0.0.6") && !totals.contains("10.0.0.5"))
  }

  test("electCnc picks the max-telnet source; min-IP tie-break is deterministic") {
    val cnc = Detect.electCnc(Detect.telnetTotals(flows)).collect()
    assert(cnc.length == 1 && cnc(0).getString(1) == "10.0.0.4")

    val tied = Seq(("d1", "10.0.0.9", 5L), ("d1", "10.0.0.2", 5L))
      .toDF("domain", "ipv4_src", "telnet_total")
    assert(Detect.electCnc(tied).collect()(0).getString(1) == "10.0.0.2")
  }

  test("flaggedSources = sources with symmetric udp 48101 traffic") {
    val f = Detect.flaggedSources(flows).collect().map(_.getString(1)).toSet
    assert(f == Set("10.0.0.1", "10.0.0.2"))
  }

  test("detect: bots score >= 0.6 and are suspected; benign hosts are gated out") {
    val out = Detect.detect(flows).collect()
      .map(r => r.getAs[String]("ipv4_src") ->
        (r.getAs[Double]("score"), r.getAs[Boolean]("is_suspected"))).toMap
    // gated to flagged sources → only .1 and .2 scored; CNC itself excluded
    assert(out.keySet == Set("10.0.0.1", "10.0.0.2"))
    // score = 1 - total/(total+cnc): .1 → 1-30/1730 ≈ 0.9827
    assert(math.abs(out("10.0.0.1")._1 - (1.0 - 30.0 / 1730.0)) < 1e-12)
    assert(out.values.forall(_._2), "both bots suspected")

    val unGated = Detect.detect(flows, gateToFlagged = false).collect()
      .map(_.getAs[String]("ipv4_src")).toSet
    assert(unGated == Set("10.0.0.1", "10.0.0.2", "10.0.0.3"))
  }

  test("compromise ratio and lockdown threshold") {
    val suspected = Detect.detect(flows)
    val c = Detect.compromise(suspected, topo).collect()(0)
    // 2 bots / 4 hosts = 50% → lockdown fires at the boundary
    assert(c.getAs[Long]("n_bots") == 2L && c.getAs[Long]("n_hosts") == 4L)
    assert(math.abs(c.getAs[Double]("pct") - 50.0) < 1e-12)
    assert(c.getAs[Boolean]("lockdown"))
  }

  test("newAlerts emits each bot once (set difference vs already-alerted)") {
    val suspected = Detect.detect(flows)
    val none = Seq.empty[(String, String)].toDF("domain", "ipv4_src")
    assert(Detect.newAlerts(suspected, none).count() == 2)
    val after = suspected.filter(col("is_suspected")).select(col("domain"), col("ipv4_src"))
    assert(Detect.newAlerts(suspected, after).count() == 0)
  }

  test("mitigations dispatch: BOT→rate-limit at attachment, CNC→drop-telnet, pct→lockdown, BLOCK→port") {
    val alerts = Seq(
      ("10.0.0.1", "BOT"), ("10.0.0.4", "CNC"),
      ("10.0.0.4", "62.5"), ("23", "BLOCK")
    ).toDF("ip", "label")
    val m = Detect.mitigations(alerts, topo).collect()
      .map(r => (r.getAs[String]("action"), Option(r.getAs[String]("target_ip")),
                 Option(r.getAs[String]("switch_name")))).toSet
    assert(m == Set(
      ("RATE_LIMIT", Some("10.0.0.1"), Some("s1")),
      ("DROP_TELNET", Some("10.0.0.4"), Some("s1")),
      ("LOCKDOWN", Some("10.0.0.4"), Some("s1")),
      ("BLOCK_PORT", None, None)))
  }

  test("quirk-parity mode: last-write-only traf_dict keeps one dst per source") {
    // clean mode sums the CNC's flows to BOTH bots; quirk mode replicates
    // the reference's `traf_dict[src] = {dst: count}` replacement bug, so
    // only the most recent (src, dst) counter survives per source
    val clean = Detect.telnetTotals(flows)
      .filter(col("ipv4_src") === "10.0.0.4").select("telnet_total").as[Long].head()
    val quirk = Detect.telnetTotals(flows, quirkLastWriteOnly = true)
      .filter(col("ipv4_src") === "10.0.0.4").select("telnet_total").as[Long].head()
    assert(clean == 900 + 800) // latest counters to .1 and .2
    assert(quirk == 800)       // only the last-written dst (.2, highest in tie-break)
    // detection still finds the same bots under the quirk (scores shift
    // but stay over threshold in this scenario)
    val qb = Detect.detect(flows, quirkLastWriteOnly = true)
      .filter(col("is_suspected")).select("ipv4_src").as[String].collect().toSet
    assert(qb == Set("10.0.0.1", "10.0.0.2"))
  }

  test("attacker attribution joins rates to victims over threshold, hosts only; pushback = anti join") {
    val rates = Seq(
      ("d1", 1L, 1, "aa:v", 80.0),  // attacker at s1 port 1 (host .1)
      ("d1", 1L, 5, "aa:v", 90.0),  // inter-switch link — excluded
      ("d1", 1L, 2, "aa:v", 3.0),   // below threshold
      ("d1", 1L, 1, "aa:x", 99.0)   // not a victim
    ).toDF("domain", "dpid", "in_port", "eth_dst", "rate")
    val victims = Seq(("d1", "aa:v"), ("d1", "aa:w")).toDF("domain", "eth_dst")
    val att = Detect.attributeAttackers(rates, victims, topo, 10.0).collect()
    assert(att.length == 1 && att(0).getAs[String]("attacker") == "10.0.0.1")

    val pb = Detect.pushbackVictims(victims,
      Detect.attributeAttackers(rates, victims, topo, 10.0)).collect()
    assert(pb.map(_.getString(1)).toSet == Set("aa:w"))
  }
}
