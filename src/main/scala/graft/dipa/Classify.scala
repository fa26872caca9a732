package graft.dipa

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Protocol classification (SURVEY.md §2.2 O2).
  *
  * Re-expresses `getProtocol` (`ryu/src/deployed_controller/
  * DIPA_Controller.py:149-195`): decimal `ip_proto` x dst-port → label, with
  * the collaboration feedback triggers (`protoTrig`/`collabTrig`,
  * `DIPA_Controller.py:123-126, 270`) as optional overrides that widen a
  * match arm. A chained `when` ladder — short-circuit order matches the
  * reference's dispatch order, whole-stage-codegen'd CASE WHEN, no UDF.
  */
object Classify {

  val Labels: Seq[String] =
    Seq("ICMP", "HTTP", "HTTPS", "Telnet", "TCP", "DNS", "DHCP", "UDP", "Unknown")

  /** Label a packet/flow from its `ip_proto` and dst-port columns.
    *
    * @param protoTrig  consumed-alert protocol trigger: treats every packet
    *                   as the given ip_proto number ("1"/"6"/"17"), as the
    *                   reference does on a collaboration alert.
    * @param collabTrig consumed-alert label trigger widening the port match
    *                   (e.g. "Telnet" labels any TCP packet Telnet).
    */
  def protocol(ipProto: Column, dstPort: Column,
               protoTrig: Option[String] = None,
               collabTrig: Option[String] = None): Column = {
    def trig(v: String): Column = lit(protoTrig.contains(v))
    def ctrig(v: String): Column = lit(collabTrig.contains(v))
    val isIcmp = ipProto === 1 || trig("1")
    val isTcp = ipProto === 6 || trig("6")
    val isUdp = ipProto === 17 || trig("17")
    when(isIcmp, "ICMP")
      .when(isTcp && (dstPort === 80 || ctrig("HTTP")), "HTTP")
      .when(isTcp && (dstPort === 443 || ctrig("HTTPS")), "HTTPS")
      .when(isTcp && (dstPort === 23 || ctrig("Telnet")), "Telnet")
      .when(isTcp, "TCP")
      .when(isUdp && (dstPort === 53 || ctrig("DNS")), "DNS")
      .when(isUdp && (dstPort === 67 || ctrig("DHCP")), "DHCP")
      .when(isUdp, "UDP")
      .otherwise("Unknown")
  }

  /** O2 — the protocol-determined OFPMatch template that `getProtocol`
    * returns ALONGSIDE the label (`DIPA_Controller.py:174-195` returns a
    * (label, proto_num, OFPMatch) 3-tuple): eth_type + ip_proto + the L4
    * dst-port arm, reproduced faithfully including the reference's quirks
    * — ICMP's `tcp_dst=2` placeholder and DNS's `udp_src=48101`
    * surveillance match. Packet-identity match fields (in_port,
    * ipv4_src/dst) come from the packet row itself; `proto_num` is the
    * middle tuple element (10 = the Unknown placeholder), and Unknown's
    * template matches in_port only (all protocol fields null).
    */
  def matchTemplate(label: Column, dstPort: Column): Column = {
    val protoNum = when(label === "ICMP", 1)
      .when(label.isin("HTTP", "HTTPS", "Telnet", "TCP"), 6)
      .when(label.isin("DNS", "DHCP", "UDP"), 17)
      .otherwise(10)
    struct(
      protoNum.as("proto_num"),
      when(label =!= "Unknown", 0x0800).as("eth_type"),
      when(label =!= "Unknown", protoNum).as("ip_proto"),
      when(label === "ICMP", 2)
        .when(label === "HTTP", 80)
        .when(label === "HTTPS", 443)
        .when(label === "Telnet", 23)
        .when(label === "TCP", dstPort).as("tcp_dst"),
      when(label === "DNS", 53)
        .when(label === "DHCP", 67)
        .when(label === "UDP", dstPort).as("udp_dst"),
      when(label === "DNS", 48101).as("udp_src"))
  }

  /** O3 — the Mirai bot-loading predicate: symmetric udp 48101 traffic flags
    * the source for surveillance (`DIPA_Controller.py:469-471`). Null match
    * fields (non-UDP flows) are simply not matched — null-safe by
    * construction, mirroring the reference's swallowed KeyError.
    */
  def isBotLoading(udpSrc: Column, udpDst: Column): Column =
    udpSrc === 48101 && udpDst === 48101

  /** O4 — telnet predicate (`DIPA_Controller.py:478`; alt port 2323 used by
    * the mitigation rules at `:402-403`).
    */
  def isTelnet(tcpDst: Column, includeAlt: Boolean = false): Column =
    if (includeAlt) tcpDst === 23 || tcpDst === 2323 else tcpDst === 23
}
