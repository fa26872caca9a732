package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch estimates must sit inside their documented error bounds against
  * exact answers, and sharded sketches must merge to the whole — the
  * property that makes them usable as persisted partials.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // two keys with very different cardinalities: "big" has 20k distinct
  // values (each twice), "small" has 40
  private lazy val data = (
    (0 until 40000).map(i => ("big", (i % 20000).toLong)) ++
      (0 until 4000).map(i => ("small", (i % 40).toLong))
  ).toDF("k", "v").cache()

  test("approxDistinct within the requested relative error") {
    val est = Sketches.approxDistinct(data, Seq("k"), $"v", rsd = 0.02)
      .as[(String, Long)].collect().toMap
    assert(math.abs(est("big") - 20000) <= 20000 * 0.05, s"big=${est("big")}")
    assert(math.abs(est("small") - 40) <= 4, s"small=${est("small")}")
  }

  test("sharded HLL sketches union to the whole") {
    // shard by row hash into 8 parts, sketch each shard independently
    val sharded = Sketches.hllSketch(
      data.withColumn("shard", pmod(xxhash64($"v"), lit(8))),
      Seq("k", "shard"), $"v")
    val merged = Sketches.hllUnion(sharded, Seq("k"), $"hll")
      .as[(String, Double)].collect().toMap
    // whole-data sketch at the same lgK
    val whole = Sketches.hllSketch(data, Seq("k"), $"v")
      .select($"k", hll_sketch_estimate($"hll").as("est"))
      .as[(String, Double)].collect().toMap
    // merging lossless HLL unions of same-lgK sketches is exact
    assert(merged == whole, s"merged=$merged whole=$whole")
    assert(math.abs(merged("big") - 20000) <= 20000 * 0.06)
  }

  test("approxQuantiles within rank-error of exact") {
    // uniform 0..19999 under "big": exact quantiles are known
    val qs = Sketches.approxQuantiles(data.filter($"k" === "big"),
        Seq("k"), $"v", Seq(0.1, 0.5, 0.99), accuracy = 10000)
      .select("quantiles").as[Seq[Long]].head
    val expected = Seq(2000L, 10000L, 19800L)
    qs.zip(expected).foreach { case (got, want) =>
      // rank error 1/accuracy of 40k rows ≈ 4 ranks ≈ 2 values; allow 40
      assert(math.abs(got - want) <= 40, s"got $got want ~$want")
    }
  }
}
