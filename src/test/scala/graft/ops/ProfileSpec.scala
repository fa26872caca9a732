package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** The profile must report exact counts/nulls/min/max, a bounded
  * distinct estimate, and must cost exactly one scan however many
  * columns are profiled.
  */
class ProfileSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private lazy val df = (0 until 1000).map { i =>
    (i.toLong, if (i % 10 == 0) null else s"v${i % 37}", i % 5)
  }.toDF("id", "name", "grp").cache()

  test("exact counts, nulls, min/max; distinct within rsd") {
    val p = Profile.columns(df)
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(p.keySet == Set("id", "name", "grp"))
    val (_, n, nulls, dst, mn, mx) = p("name")
    assert(n == 1000 && nulls == 100)
    assert(math.abs(dst - 37) <= 4) // 36 non-null values v1..v36 + v0? check below
    assert(mn == "v0" && mx == "v9") // string ordering
    val (_, _, idNulls, idDst, idMn, idMx) = p("id")
    assert(idNulls == 0 && math.abs(idDst - 1000) <= 60)
    assert(idMn == "0" && idMx == "999")
  }

  test("one scan regardless of column count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Profile.columns(docs).queryExecution.executedPlan
    val scans = collectWithSubqueries(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"expected one scan, got ${scans.size}")
  }
}
