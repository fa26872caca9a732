package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit (PLANS.md's method, as a repeatable main): build
  * every SparkEntry query at the given SF and scan its executedPlan for
  * the shapes that hurt at scale — CartesianProduct, nested-loop joins,
  * sort-merge joins, scan counts. Prints one line per query with non-zero
  * flags, then a summary. Usage:
  *   tools/run.sh graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)

    def count(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)

    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cart = count(plan, "CartesianProduct")
        val bnlj = count(plan, "BroadcastNestedLoopJoin")
        val smj = count(plan, "SortMergeJoin")
        if (cart + bnlj + smj > 0) {
          flagged += 1
          println(f"$name%-28s cartesian=$cart bnlj=$bnlj smj=$smj")
        }
        spark.catalog.clearCache()
      } catch { case e: Throwable =>
        println(s"$name ERROR ${e.toString.takeWhile(_ != '\n').take(120)}")
      }
    }
    println(s"== ${SparkEntry.queries.size} queries, $flagged with non-default join shapes ==")
    spark.stop()
  }
}
