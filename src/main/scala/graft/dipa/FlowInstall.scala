package graft.dipa

import graft.model.PacketEvent
import graft.streaming.StateMachines
import graft.streaming.StateMachines.MacObs
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The §3.3 flow-install pipeline (`ryu/src/deployed_controller/
  * DIPA_Controller.py:230-291`): packet-in events → LLDP drop (O5) → MAC
  * learning (C8) → out-port lookup with FLOOD fallback (J2) → protocol
  * classification with feedback triggers (O2/C7) → `FlowRule` decisions
  * (S10 as data — side effects stay outside the engine).
  *
  * Batch form is pure DataFrame transforms (broadcast join against the
  * learned-MAC table); the streaming form runs the same plan per
  * micro-batch with the MAC table maintained by keyed state
  * (StateMachines.macLearning).
  */
object FlowInstall {

  val LldpEthertype = 0x88cc
  val FloodPort: Int = -1 // OFPP_FLOOD stand-in

  /** A flow-rule decision (`OFPFlowMod` as data, priorities/timeouts per
    * `DIPA_Controller.py:213-226, 276-284`).
    */
  final case class FlowRule(
      domain: String, dpid: Long, in_port: Int, eth_src: String, eth_dst: String,
      out_port: Int, protocol: String, priority: Int,
      idle_timeout_s: Int, hard_timeout_s: Int)

  /** O5 — discard LLDP control traffic before any downstream work
    * (`DIPA_Controller.py:249-251`); the filter sits on the scan.
    */
  def dropLldp(packets: DataFrame): DataFrame =
    packets.filter(col("ethertype") =!= LldpEthertype)

  /** C8 — the learned MAC table from a packet history: last-write-wins
    * `(domain, dpid, eth_src) → in_port` (`DIPA_Controller.py:257-260`).
    * Batch twin of StateMachines.macLearning (same step semantics).
    */
  def learnedMacs(packets: DataFrame): DataFrame =
    graft.ops.Windows.lastPerKey(dropLldp(packets),
        Seq("domain", "dpid", "eth_src"), Seq("event_ts", "buffer_id"))
      .select(col("domain"), col("dpid"), col("eth_src").as("mac"),
        col("in_port").as("learned_port"))

  /** J2 + O2 + S10 — resolve the out port from the learned table (FLOOD
    * when unknown), classify the protocol (with optional C7 triggers),
    * and emit flow rules for everything except Unknown
    * (`DIPA_Controller.py:262-284`: Unknown gets a PacketOut but no rule).
    */
  def flowRules(packets: DataFrame, macTable: DataFrame,
                protoTrig: Option[String] = None,
                collabTrig: Option[String] = None): DataFrame = {
    val lookup = broadcast(macTable
      .withColumnRenamed("mac", "eth_dst").withColumnRenamed("learned_port", "out_port"))
    dropLldp(packets)
      .join(lookup, Seq("domain", "dpid", "eth_dst"), "left")
      .withColumn("out_port", coalesce(col("out_port"), lit(FloodPort)))
      .withColumn("protocol",
        Classify.protocol(col("ip_proto"), col("l4_dst_port"), protoTrig, collabTrig))
      .filter(col("protocol") =!= "Unknown")
      .select(col("domain"), col("dpid"), col("in_port"), col("eth_src"),
        col("eth_dst"), col("out_port"), col("protocol"),
        Classify.matchTemplate(col("protocol"), col("l4_dst_port")).as("match_template"),
        lit(10).as("priority"), lit(60).as("idle_timeout_s"), lit(100).as("hard_timeout_s"))
  }

  /** The composed batch pipeline: packets → rules against their own
    * learned-MAC history.
    */
  def install(packets: DataFrame,
              protoTrig: Option[String] = None,
              collabTrig: Option[String] = None): DataFrame =
    flowRules(packets, learnedMacs(packets), protoTrig, collabTrig)

  /** Streaming MAC learning over packet events (C8 keyed state). */
  def macStream(packets: Dataset[PacketEvent]): Dataset[StateMachines.MacEntry] = {
    import packets.sparkSession.implicits._
    StateMachines.macLearning(packets
      .filter(_.ethertype != LldpEthertype)
      .map(p => MacObs(p.domain, p.dpid, p.eth_src, p.buffer_id, p.in_port)))
  }
}
