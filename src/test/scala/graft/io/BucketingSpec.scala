package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketed tables must join with NO exchange on either side — the
  * read-time proof that the ingest shuffle was the only shuffle.
  */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // shared fixture so each test runs standalone
  private lazy val tablesReady: Unit = {
    val base = new java.io.File("target/bucketed_spec").getAbsolutePath
    Bucketing.writeBucketed(Tables.orders(spark, dir), "spec_orders",
      s"$base/orders", 4, Seq("o_custkey"))
    Bucketing.writeBucketed(Tables.customer(spark, dir), "spec_customer",
      s"$base/customer", 4, Seq("c_custkey"))
  }

  test("same-bucket-count join plans without any shuffle exchange") {
    tablesReady
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so only the bucket metadata can avoid the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("spec_orders").join(spark.table("spec_customer"),
        $"o_custkey" === $"c_custkey")
      val shuffles = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join should be exchange-free:\n${joined.queryExecution.executedPlan}")

      // and the result is the plain join's result
      val naive = Tables.orders(spark, dir).join(Tables.customer(spark, dir),
        $"o_custkey" === $"c_custkey")
      assert(joined.count() == naive.count())
      val a = joined.agg(sum($"o_totalprice".cast("decimal(18,2)")))
        .as[java.math.BigDecimal].head
      val b = naive.agg(sum($"o_totalprice".cast("decimal(18,2)")))
        .as[java.math.BigDecimal].head
      assert(a == b)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("groupBy on the bucket key is also exchange-free") {
    tablesReady
    val agg = spark.table("spec_orders").groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
    val shuffles = collectWithSubqueries(agg.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"bucketed groupBy should be exchange-free:\n${agg.queryExecution.executedPlan}")
    assert(agg.count() == Tables.orders(spark, dir)
      .select("o_custkey").distinct().count())
  }
}
