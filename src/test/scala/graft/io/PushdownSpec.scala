package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** PLANS.md claims every query family pushes its filters and projections
  * into the parquet scan; this spec makes the claim executable. A scan
  * that reads all columns for a two-column projection, or evaluates a
  * pushable predicate above the reader, is a 100 TB bug that sf0.01
  * timing never shows.
  */
class PushdownSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }

  test("filters reach the parquet reader as pushed data filters") {
    val df = Tables.documents(spark, dir)
      .filter(col("lang") === "en" && col("n_chars") > 100)
      .select("doc_id")
    val s = scans(df)
    assert(s.nonEmpty)
    val pushed = s.head.dataFilters.map(_.sql).mkString(";")
    assert(pushed.contains("lang") && pushed.contains("n_chars"),
      s"expected both predicates at the scan, got: $pushed")
  }

  test("column pruning: the scan schema is only what the query needs") {
    val df = Tables.documents(spark, dir)
      .filter(col("lang") === "en")
      .select(col("doc_id"), length(col("text")).as("len"))
    val read = scans(df).head.requiredSchema.fieldNames.toSet
    // text/doc_id are computed on, lang only filtered on; source and
    // n_chars must NOT be read
    assert(read == Set("doc_id", "text", "lang"), s"read $read")
  }

  test("a detection-family predicate prunes at the events scan") {
    val df = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select("event_id", "value")
    val s = scans(df).head
    assert(s.dataFilters.map(_.sql).mkString(";").contains("event_type"))
    // ts is materialized by the reader-level rename/derive in Tables; the
    // pruned read must still exclude the wide props column
    assert(!s.requiredSchema.fieldNames.contains("props"),
      s"props should be pruned, read ${s.requiredSchema.fieldNames.toSeq}")
  }
}
