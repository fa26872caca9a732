package graft.dipa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alert wire codec (SURVEY.md §2.2 O8/O9).
  *
  * The reference exchanges UTF-8 `@`-delimited positional strings between
  * domains (`ryu/src/deployed_controller/DIPA_Controller.py:333-352`):
  * `"<ip>@BOT"`, `"<cnc>@CNC"`, `"<cnc>@<pct>"`, `"BLOCK@<port>"`,
  * `"<src>@<dst_port>@<rate>"`. Consumers strip stray `{ } '` noise before
  * parsing (`demo3.py:332-337`, `DIPA_Controller.py:371-373`) — the decoder
  * tolerates the same.
  *
  * Pure column expressions: codegen'd, no UDFs, fully pushdown-friendly.
  */
object Codec {

  /** Encode n fields as an `@`-joined wire string. */
  def encode(fields: Column*): Column = concat_ws("@", fields: _*)

  /** Strip the `{ } '` wrapper noise observed on the wire. */
  def denoise(wire: Column): Column = regexp_replace(wire, "[{}']", "")

  /** Extract the i-th (0-based) `@`-field of a denoised wire string. */
  def field(wire: Column, i: Int): Column = split(denoise(wire), "@").getItem(i)

  /** Decode a 2-field alert `"<ip>@<label>"` into (ip, label) columns. */
  def decodeAlert(df: DataFrame, wire: String = "value"): DataFrame =
    df.withColumn("ip", field(col(wire), 0))
      .withColumn("label", field(col(wire), 1))

  /** Decode a 3-field global-view update `"<src>@<dst_port>@<rate>"`. */
  def decodeUpdate(df: DataFrame, wire: String = "value"): DataFrame =
    df.withColumn("src", field(col(wire), 0))
      .withColumn("dst_port", field(col(wire), 1).cast("int"))
      .withColumn("rate", field(col(wire), 2).cast("double"))

  /** Decode a timing record `"<control_plane_s>@<yyyy-MM-dd HH:mm:ss.SSSSSS>"`
    * (`DIPA_Controller.py:501`; parsed `threaded_consumer.py:55`).
    */
  def decodeTiming(df: DataFrame, wire: String = "value"): DataFrame =
    df.withColumn("control_plane_s", field(col(wire), 0).cast("double"))
      .withColumn("wall_ts",
        to_timestamp(field(col(wire), 1), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
}
