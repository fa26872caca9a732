package graft.dipa

import graft.ops.{Rankings, Windows}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The flagship detection pipeline (SURVEY.md §3.1), re-expressed as pure
  * DataFrame transforms over `FlowStat`-shaped frames.
  *
  * Reference behavior: `ryu/src/deployed_controller/DIPA_Controller.py
  * :452-501` (scoring) + `:323-352` (alerting), with the §7.1 cleanups:
  * deltas keyed by flow identity (not sort position), telnet totals over the
  * true last-per-(src,dst) snapshot (not last-write-only), deterministic
  * argmax (min-IP tie-break), configurable 0.6 threshold.
  *
  * Everything is per-`domain`: on a cluster each domain's state partitions
  * independently, so the same plan serves 2 domains or 10k (the groupBy keys
  * always include `domain` — no global shuffle hotspot).
  */
object Detect {

  /** Flow identity for counter deltas (`TestCase_2/Controller1.py:292`
    * keys by (dpid, in_port, eth_dst, out_port); we use the full match).
    */
  val flowKey: Seq[String] = Seq(
    "domain", "dpid", "in_port", "ipv4_src", "ipv4_dst",
    "ip_proto", "tcp_src", "tcp_dst", "udp_src", "udp_dst", "out_port")

  /** O1 — detection only looks at data flows (`priority == 10`),
    * skipping installed block rules (`DIPA_Controller.py:459`).
    */
  def dataFlows(flows: DataFrame): DataFrame =
    flows.filter(col("priority") === 10)

  /** W3/J9 — per-flow packet/byte deltas vs the previous poll. */
  def withDeltas(flows: DataFrame): DataFrame = {
    val d = Windows.delta(flows, flowKey, Seq("poll_id"), "packet_count", "pkt_delta")
    Windows.delta(d, flowKey, Seq("poll_id"), "byte_count", "byte_delta")
  }

  /** O6 — Kbit/s bitrate from byte deltas (`Controller1.py:516-518`). */
  def kbps(byteDelta: Column, intervalS: Column): Column =
    byteDelta * 8 / (intervalS * 1000)

  /** O3 — sources flagged by symmetric udp/48101 loading traffic
    * (`DIPA_Controller.py:469-471`): one row per (domain, ipv4_src).
    */
  def flaggedSources(flows: DataFrame): DataFrame =
    dataFlows(flows)
      .filter(Classify.isBotLoading(col("udp_src"), col("udp_dst")))
      .select(col("domain"), col("ipv4_src"))
      .distinct()

  /** A1 — per-source telnet volume over the latest counter snapshot:
    * last packet_count per (domain, src, dst), summed per (domain, src)
    * (`DIPA_Controller.py:478-481`, cleaned per SURVEY §7.1).
    *
    * `quirkLastWriteOnly` replicates the reference's literal
    * `traf_dict[src] = {dst: count}` bug — each write REPLACES the whole
    * per-source map, so only the most recently seen (src, dst) counter
    * survives. Off by default; exists for byte-exact parity experiments
    * against the reference (SURVEY §7.1/§7.5 quirk-parity mode).
    */
  def telnetTotals(flows: DataFrame, quirkLastWriteOnly: Boolean = false): DataFrame = {
    val telnet = dataFlows(flows).filter(Classify.isTelnet(col("tcp_dst")))
    val keys =
      if (quirkLastWriteOnly) Seq("domain", "ipv4_src")
      else Seq("domain", "ipv4_src", "ipv4_dst")
    Windows.lastPerKey(telnet, keys, Seq("poll_id", "ipv4_dst"))
      .groupBy(col("domain"), col("ipv4_src"))
      .agg(sum(col("packet_count")).as("telnet_total"))
  }

  /** A2 — CNC election: the source with the most telnet traffic per domain,
    * ties broken to the lowest IP (`DIPA_Controller.py:485`, §7.1).
    */
  def electCnc(totals: DataFrame): DataFrame =
    Rankings.argmax(totals, Seq("domain"), col("telnet_total"), Seq(col("ipv4_src")))
      .select(col("domain"), col("ipv4_src").as("cnc_ip"),
              col("telnet_total").as("cnc_total"))

  /** O13/J6/J8 — bias ratio per source: `1 - total/(total + cnc_total)`
    * (`DIPA_Controller.py:489`), CNC excluded (`:488`), optionally gated to
    * 48101-flagged sources (left-semi, the J6 suspicion gate; the shipped
    * code scores every telnet source — `gateToFlagged=false` replicates
    * that).
    */
  def biasScores(totals: DataFrame, cnc: DataFrame, flagged: DataFrame,
                 gateToFlagged: Boolean = true): DataFrame = {
    val joined = totals
      .join(cnc, Seq("domain"))
      .filter(col("ipv4_src") =!= col("cnc_ip"))
      .withColumn("score",
        lit(1.0) - col("telnet_total") / (col("telnet_total") + col("cnc_total")))
    if (gateToFlagged)
      joined.join(flagged, Seq("domain", "ipv4_src"), "left_semi")
    else joined
  }

  /** A3 — suspected-bot set: score >= threshold (0.6 shipped, 0.8 thesis —
    * `DIPA_Controller.py:497`, SURVEY §7.1).
    */
  def suspectedBots(scores: DataFrame, threshold: Double = 0.6): DataFrame =
    scores.filter(col("score") >= threshold)

  /** The composed §3.1 pipeline: flows → per-source verdicts.
    * Output: (domain, ipv4_src, telnet_total, cnc_ip, cnc_total, score,
    * is_suspected).
    */
  def detect(flows: DataFrame, threshold: Double = 0.6,
             gateToFlagged: Boolean = true,
             quirkLastWriteOnly: Boolean = false): DataFrame = {
    // totals is referenced TWICE downstream (the CNC argmax and the
    // bias join), and its lineage is the pipeline's heavy part — the
    // last-per-key window + aggregate over every telnet flow row.
    // Materialize it once (round 13): the relation is one row per
    // (domain, source) — tiny at any scale — and without the barrier
    // both references re-ran the window+agg over the full flow frame.
    // Batch-only composition (the bench/probe path; the streaming plane
    // runs its own stateful operators), so a checkpoint is legal here;
    // the individual operators stay lazy for the oracle rows. The
    // isStreaming guard mirrors capDf: a streaming caller gets the lazy
    // plan (double-eval, but a working query) instead of the
    // AnalysisException localCheckpoint throws on streaming frames.
    val totals = {
      val t = telnetTotals(flows, quirkLastWriteOnly)
      if (t.isStreaming) t else t.localCheckpoint(true)
    }
    val cnc = electCnc(totals)
    val flagged = flaggedSources(flows)
    biasScores(totals, cnc, flagged, gateToFlagged)
      .withColumn("is_suspected", col("score") >= threshold)
  }

  /** A4/O12 — compromise ratio per domain: |suspected| / |hosts| * 100;
    * lockdown at >= 50 % (`DIPA_Controller.py:348-351`, intended latch
    * semantics per §7.1). `hosts` = topology host dimension.
    */
  def compromise(suspected: DataFrame, hosts: DataFrame,
                 lockdownPct: Double = 50.0): DataFrame = {
    val nBots = suspected.filter(col("is_suspected"))
      .groupBy(col("domain"))
      .agg(countDistinct(col("ipv4_src")).as("n_bots"))
    val nHosts = hosts.filter(col("is_host"))
      .agg(countDistinct(col("attached")).as("n_hosts"))
    nBots.crossJoin(broadcast(nHosts))
      .withColumn("pct", lit(100.0) * col("n_bots") / col("n_hosts"))
      .withColumn("lockdown", col("pct") >= lockdownPct)
  }

  /** E1 — flag-once alert gating (`suspected - alreadyAlerted`,
    * `DIPA_Controller.py:327-328`): alerts only for newly-suspected ips.
    */
  def newAlerts(suspected: DataFrame, alreadyAlerted: DataFrame): DataFrame =
    suspected.filter(col("is_suspected"))
      .select(col("domain"), col("ipv4_src"))
      .except(alreadyAlerted.select(col("domain"), col("ipv4_src")))

  /** C6 — mitigation dispatch: decoded alerts → mitigation decisions
    * (`DIPA_Controller.py:377-413`; TC7 BLOCK at `timeStamp2.py:273-277`).
    * BOT → rate-limit at the bot's attachment point (J1 topology broadcast
    * join) + drop-48101; CNC → drop telnet 23/2323 from ip; numeric pct →
    * global telnet lockdown; BLOCK → block the named port.
    */
  def mitigations(alerts: DataFrame, topology: DataFrame): DataFrame = {
    val a = alerts.withColumn("is_pct", col("label").rlike("^[0-9.]+$"))
    val topo = broadcast(topology.filter(col("is_host"))
      .select(col("attached"), col("switch_name"), col("port")))
    a.join(topo, a("ip") === topo("attached"), "left")
      .select(
        when(col("label") === "BOT", "RATE_LIMIT")
          .when(col("label") === "CNC", "DROP_TELNET")
          .when(col("label") === "BLOCK", "BLOCK_PORT")
          .when(col("is_pct"), "LOCKDOWN")
          .otherwise("UNKNOWN").as("action"),
        when(col("label") === "BLOCK", null).otherwise(col("ip")).as("target_ip"),
        col("switch_name"), col("port"),
        when(col("label") === "CNC", 100).otherwise(10).as("priority"),
        lit(60).as("idle_timeout_s"), lit(100).as("hard_timeout_s"))
  }

  /** J4/J5 — attacker attribution (`Controller1.py:476-503`): every
    * (switch, port) whose flow rate toward a victim exceeds the threshold,
    * excluding inter-switch links, resolved to host MAC/IP via the topology
    * dimension. `rates`: (domain, dpid, in_port, eth_dst, rate).
    */
  def attributeAttackers(rates: DataFrame, victims: DataFrame,
                         topology: DataFrame, threshold: Double): DataFrame =
    rates
      .join(victims, Seq("domain", "eth_dst"), "left_semi")
      .filter(col("rate") > threshold)
      .join(broadcast(topology.filter(col("is_host"))),
        rates("dpid") === topology("dpid") && rates("in_port") === topology("port"))
      .select(col("domain"), col("switch_name"), col("port"),
              col("attached").as("attacker"), col("eth_dst"), col("rate"))

  /** J7 — pushback detection (`Controller1.py:395-413`): victims with no
    * locally-attributed attacker — the attack originates in another domain.
    */
  def pushbackVictims(victims: DataFrame, attackers: DataFrame): DataFrame =
    victims.join(attackers, Seq("domain", "eth_dst"), "left_anti")
}
