package graft.dipa

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the protocol-classification ladder (O2) and the alert wire
  * codec (O8/O9), including the reference's trigger overrides and wire-noise
  * tolerance (`DIPA_Controller.py:149-195, 371-373`; `demo3.py:332-337`).
  */
class ClassifyCodecSpec extends SparkSpec {
  import spark.implicits._

  test("protocol ladder labels proto/port combinations like getProtocol") {
    val rows = Seq(
      (Some(1), None: Option[Int], "ICMP"),
      (Some(6), Some(80), "HTTP"), (Some(6), Some(443), "HTTPS"),
      (Some(6), Some(23), "Telnet"), (Some(6), Some(9999), "TCP"),
      (Some(17), Some(53), "DNS"), (Some(17), Some(67), "DHCP"),
      (Some(17), Some(9999), "UDP"),
      (Some(99), Some(80), "Unknown"), (None, None, "Unknown"))
    val df = rows.toDF("ip_proto", "dst_port", "expected")
      .withColumn("got", Classify.protocol(col("ip_proto"), col("dst_port")))
    assert(df.filter(col("got") =!= col("expected")).count() == 0)
  }

  test("collab trigger widens a match arm; proto trigger overrides ip_proto") {
    val df = Seq((Some(6), Some(9999))).toDF("ip_proto", "dst_port")
    assert(df.select(Classify.protocol(col("ip_proto"), col("dst_port"),
      collabTrig = Some("Telnet"))).collect()(0).getString(0) == "Telnet")
    val noProto = Seq((None: Option[Int], None: Option[Int])).toDF("ip_proto", "dst_port")
    assert(noProto.select(Classify.protocol(col("ip_proto"), col("dst_port"),
      protoTrig = Some("1"))).collect()(0).getString(0) == "ICMP")
  }

  test("match template mirrors getProtocol's OFPMatch per label, quirks included") {
    val rows = Seq(
      (Some(1), None: Option[Int]), (Some(6), Some(80)), (Some(6), Some(443)),
      (Some(6), Some(23)), (Some(6), Some(9999)), (Some(17), Some(53)),
      (Some(17), Some(67)), (Some(17), Some(9999)), (Some(99), Some(80)))
    val df = rows.toDF("ip_proto", "dst_port")
      .withColumn("label", Classify.protocol(col("ip_proto"), col("dst_port")))
      .withColumn("t", Classify.matchTemplate(col("label"), col("dst_port")))
      .select(col("label"), col("t.proto_num"), col("t.eth_type"),
        col("t.tcp_dst"), col("t.udp_dst"), col("t.udp_src"))
    val got = df.collect().map(r => (r.getString(0),
      r.getInt(1),
      Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSet
    assert(got == Set(
      ("ICMP", 1, Some(0x0800), Some(2), None, None),      // reference's tcp_dst=2 quirk
      ("HTTP", 6, Some(0x0800), Some(80), None, None),
      ("HTTPS", 6, Some(0x0800), Some(443), None, None),
      ("Telnet", 6, Some(0x0800), Some(23), None, None),
      ("TCP", 6, Some(0x0800), Some(9999), None, None),    // generic TCP matches its own port
      ("DNS", 17, Some(0x0800), None, Some(53), Some(48101)), // udp_src=48101 quirk
      ("DHCP", 17, Some(0x0800), None, Some(67), None),
      ("UDP", 17, Some(0x0800), None, Some(9999), None),
      ("Unknown", 10, None, None, None, None)))            // in_port-only match
  }

  test("bot-loading predicate is null-safe (non-udp rows don't match)") {
    val df = Seq(
      (Some(48101), Some(48101), true),
      (Some(48101), Some(53), false),
      (None: Option[Int], None: Option[Int], false))
      .toDF("udp_src", "udp_dst", "expected")
    val got = df.withColumn("got",
      coalesce(Classify.isBotLoading(col("udp_src"), col("udp_dst")), lit(false)))
    assert(got.filter(col("got") =!= col("expected")).count() == 0)
  }

  test("alert codec round-trips and tolerates {}' wire noise") {
    val wire = Seq("{'10.0.0.7@BOT'}", "10.0.0.4@CNC").toDF("value")
    val decoded = Codec.decodeAlert(wire).select("ip", "label").as[(String, String)]
      .collect().toSet
    assert(decoded == Set(("10.0.0.7", "BOT"), ("10.0.0.4", "CNC")))

    val enc = Seq(("10.0.0.9", "BOT")).toDF("ip", "label")
      .select(Codec.encode(col("ip"), col("label")).as("value"))
    assert(Codec.decodeAlert(enc).select("ip", "label").as[(String, String)]
      .collect()(0) == ("10.0.0.9", "BOT"))
  }

  test("3-field update + timing decode with typed casts") {
    val upd = Codec.decodeUpdate(Seq("10.0.0.3@23@44.5").toDF("value")).collect()(0)
    assert(upd.getAs[String]("src") == "10.0.0.3")
    assert(upd.getAs[Int]("dst_port") == 23 && upd.getAs[Double]("rate") == 44.5)

    val t = Codec.decodeTiming(Seq("0.125@2019-04-01 12:30:45.123456").toDF("value")).collect()(0)
    assert(t.getAs[Double]("control_plane_s") == 0.125)
    assert(t.getAs[java.sql.Timestamp]("wall_ts").toString == "2019-04-01 12:30:45.123456")
  }
}
