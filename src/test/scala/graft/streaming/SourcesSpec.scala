package graft.streaming

import graft.SparkSpec
import graft.fixtures.Fixtures
import org.apache.spark.sql.streaming.OutputMode

/** Directory-backed typed sources: a FlowStat parquet drop directory feeds
  * the detection stream end to end (the S1 poll source without a broker).
  */
class SourcesSpec extends SparkSpec {

  import spark.implicits._

  test("S1: parquet drop directory streams FlowStats into detection") {
    val dir = java.nio.file.Files.createTempDirectory("graft-polls").toString
    val sc = Fixtures.scenario(Fixtures.ScenarioParams(nBenignFlows = 50, nBots = 2))
    val polls = sc.flows.groupBy(_.poll_id).toSeq.sortBy(_._1)

    val src = Sources.flowStats(spark, dir)
    assert(src.isStreaming)
    val q = DetectionStream.alerts(src).writeStream
      .format("memory").queryName("src_out").outputMode(OutputMode.Update()).start()
    try {
      polls.foreach { case (_, rows) =>
        rows.toDS().write.mode("append").parquet(dir) // one drop per poll
        q.processAllAvailable()
      }
      val alerts = spark.table("src_out")
        .as[DetectionStream.DomainAlert].collect()
      assert(alerts.filter(_.label == "BOT").map(_.ip).toSet == sc.bots.toSet)
    } finally q.stop()
  }
}
