package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The skew rewrites must be row-identical to the naive forms they replace,
  * and must actually spread a hot key across tasks.
  */
class SkewSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  // one pathologically hot key ("hot": 900 rows), two cold ones
  private lazy val skewed: DataFrame = (
    (1 to 900).map(i => ("hot", i.toLong, i % 37)) ++
      (1 to 60).map(i => ("warm", (1000 + i).toLong, i % 11)) ++
      (1 to 5).map(i => ("cold", (2000 + i).toLong, i))
  ).toDF("k", "id", "v").cache()

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("salt is deterministic and in range") {
    val salts = skewed.select(Skew.salt(8, $"id").as("s"))
      .collect().map(_.getInt(0))
    assert(salts.forall(s => s >= 0 && s < 8))
    val again = skewed.select(Skew.salt(8, $"id").as("s"))
      .collect().map(_.getInt(0))
    assert(salts.toSeq == again.toSeq)
    // the hot key's rows really land in every slot
    assert(salts.toSet.size == 8)
  }

  test("topKPerKey equals the naive single-task window") {
    val order = Seq($"v".desc, $"id".asc)
    val naive = skewed
      .withColumn("rk", row_number().over(
        Window.partitionBy($"k").orderBy(order: _*)))
      .filter($"rk" <= 4).drop("rk")
    val salted = Skew.topKPerKey(skewed, Seq("k"), order, 4, 8, $"id")
    assert(rows(salted) == rows(naive))
    assert(salted.count() == 12) // 3 keys x 4
  }

  test("saltedJoin equals the plain inner join, without a broadcast") {
    val dim = Seq(("hot", "H"), ("warm", "W"), ("cold", "C"), ("unused", "U"))
      .toDF("k", "label")
    val naive = skewed.join(dim, Seq("k")).select("k", "id", "label")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), 8, $"id")
      .select("k", "id", "label")
    assert(rows(salted) == rows(naive))
    // in the no-broadcast regime it exists for, the join must be a shuffle
    // join keyed on (k, __salt) — verify no BroadcastHashJoin appears
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Skew.saltedJoin(skewed, dim, Seq("k"), 8, $"id")
        .queryExecution.executedPlan
      val bcast = collectWithSubqueries(plan) {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bcast.isEmpty, "expected a shuffle join under salted keys")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("distinctCount and distinctSet equal the naive distinct aggregation") {
    val naiveCnt = skewed.groupBy("k")
      .agg(count_distinct($"v").as("n")).as[(String, Long)]
      .collect().toMap
    val cnt = Skew.distinctCount(skewed, Seq("k"), $"v", 8, "n")
      .as[(String, Long)].collect().toMap
    assert(cnt == naiveCnt)

    val naiveSet = skewed.groupBy("k")
      .agg(sort_array(collect_set($"v")).as("vs")).as[(String, Seq[Int])]
      .collect().toMap
    val set = Skew.distinctSet(skewed, Seq("k"), $"v", 8, "vs")
      .as[(String, Seq[Int])].collect().toMap
    assert(set == naiveSet)
  }

  test("profile reports counts and shares, heaviest first") {
    val p = Skew.profile(skewed, Seq("k"), 2)
      .as[(String, Long, Double)].collect()
    assert(p.toSeq == Seq(("hot", 900L, 900.0 / 965), ("warm", 60L, 60.0 / 965)))
  }
}
