package graft.dipa

import graft.model.PortStat
import graft.ops.Windows
import graft.streaming.StateMachines
import graft.streaming.StateMachines.PortRateObs
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S2 port-stat wiring and the S12 console stat tables.
  *
  * `portRateObs` turns cumulative per-port rx counters into the Kbit/s
  * observations the ingress hysteresis machine consumes
  * (`TestCase_2/Controller1.py:521-533` handler feeding `:417-443`), so a
  * PortStat stream plugs straight into StateMachines.ingress.
  *
  * `flowTable` / `droppedTable` are the TC5 formatted stat reports
  * (`TestCase_5/timeStamp.py:282-299` legitimate flows ordered by
  * (in_port, eth_dst) — W1; `:310-323` dropped flows ordered by source —
  * W2). Sinks stay outside the engine: callers `.show()` them or attach
  * a console/`foreachBatch` sink.
  */
object Report {

  /** S2/O6 — per-port Kbit/s from cumulative rx byte counters. */
  def portRateObs(ports: Dataset[PortStat], intervalS: Double): Dataset[PortRateObs] = {
    import ports.sparkSession.implicits._
    Windows.delta(ports.toDF(), Seq("domain", "dpid", "port_no"), Seq("poll_id"),
        "rx_bytes", "rx_delta")
      .filter(col("rx_delta").isNotNull)
      .select(col("domain"), col("dpid"), col("port_no").as("port"),
        col("poll_id"), (col("rx_delta") * 8 / (intervalS * 1000)).as("max_rate"))
      .as[PortRateObs]
  }

  /** The composed S2 → C1/C2/C9 path: port counters in, ingress
    * APPLY/REMOVE commands out.
    */
  def ingressFromPortStats(ports: Dataset[PortStat], intervalS: Double,
                           attackTh: Double = 100.0, peaceTh: Double = 10.0): Dataset[StateMachines.IngressCmd] =
    StateMachines.ingress(portRateObs(ports, intervalS), attackTh, peaceTh)

  /** S12/W1 — legitimate-flow stat table (priority 10, canonical order). */
  def flowTable(flows: DataFrame): DataFrame =
    flows.filter(col("priority") === 10)
      .select(col("domain"), col("dpid"), col("in_port"), col("eth_dst"),
        col("out_port"), col("packet_count"), col("byte_count"))
      .orderBy(col("dpid"), col("in_port"), col("eth_dst"))

  /** S12/W2 — dropped-flow report (block rules, ordered by source). */
  def droppedTable(flows: DataFrame): DataFrame =
    flows.filter(col("priority") === 100)
      .select(col("domain"), col("dpid"), col("ipv4_src"), col("ipv4_dst"),
        col("packet_count"))
      .orderBy(col("ipv4_src"), col("ipv4_dst"))
}
