package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The merges-table BPE encoder: hand-computed merge sequences, boundary
  * safety of the wrapped-symbol representation, and the document-level
  * count's pre-token dispatch. (Engine parity for the same math is the
  * t6_bpe_merges oracle row.)
  */
class TextBpeSpec extends SparkSpec {

  import spark.implicits._

  private def enc(words: String*): Map[String, String] =
    words.toDF("w")
      .select(col("w"), Text.bpeEncode(col("w")).as("e"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("merges apply in rank order and compose") {
    val e = enc("the", "and", "thinking", "zq")
    // (t)(h)(e): t+h -> th (rank 1), th+e -> the (rank 10)
    assert(e("the") == "(the)")
    // (a)(n)(d): a+n -> an, an+d -> and
    assert(e("and") == "(and)")
    // t+h, i+n (twice), in+g: th|in|k|ing
    assert(e("thinking") == "(th)(in)(k)(ing)")
    // no merge applies to unseen pairs — stays character-split
    assert(e("zq") == "(z)(q)")
  }

  test("wrapped symbols block cross-boundary and overlapping merges") {
    // "hth": (h)(t)(h) -> t+h merges the LAST two, and the leading (h)
    // must not pair with the 't' inside "(th)" afterwards
    assert(enc("hth")("hth") == "(h)(th)")
    // adjacent occurrences share no characters: (t)(h)(t)(h) -> (th)(th)
    assert(enc("thth")("thth") == "(th)(th)")
  }

  test("document count: letter runs encode, other pre-tokens count 1") {
    val df = Seq(
      ("the and", 2),       // " and" folds its space: |the| + |and|
      ("it is 42!", 4),     // it|is + digit run + punct run
      ("thinking", 4),      // th|in|k|ing
      ("", 0)               // empty text -> zero tokens
    ).toDF("text", "expect")
    val got = df.select(col("expect"), Text.bpeMergeTokenCount(col("text")).as("n"))
      .collect()
    got.foreach(r => assert(r.getAs[Int]("n") == r.getAs[Int]("expect"),
      s"expected ${r.getAs[Int]("expect")} got ${r.getAs[Int]("n")}"))
    // the real count never exceeds the character count and never
    // undercuts the pre-token count
    val doc = Seq("the quick brown fox thinks and jumps").toDF("text")
    val r = doc.select(
      Text.bpeTokenCount(col("text")).as("pre"),
      Text.bpeMergeTokenCount(col("text")).as("bpe"),
      length(col("text")).as("chars")).collect().head
    assert(r.getAs[Int]("bpe") >= r.getAs[Int]("pre"))
    assert(r.getAs[Int]("bpe") <= r.getAs[Int]("chars"))
  }
}
