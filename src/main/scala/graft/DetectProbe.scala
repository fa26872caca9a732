package graft

import graft.dipa.Detect
import graft.fixtures.Fixtures

/** Batch-detection diagnostic runner — isolates the `detect_7500_batch`
  * bench row (BENCH_r08 drifted 0.71 → ~1.1 s across three independent
  * runs with no detection file changed) from the rest of the suite, and
  * lets session-state interactions be A/B'd directly:
  *
  *   tools/run.sh graft.DetectProbe [trials] [nFlows] [nBots]
  *
  * `SPARK_GRAFT_PRELOAD` (comma list) runs candidate contaminators
  * BEFORE the timed trials, mirroring what the full Bench suite has
  * already done by the time the detect section runs:
  *   - `events`:  read `Tables.events` (its reader dispatch + tz pin)
  *   - `simhash`: run a d4 SimHash query (native-kernel registration)
  *   - `queries`: run the full SparkEntry.queries sweep (the bench's
  *                actual prefix)
  * Times print per trial; compare `none` vs each preload to attribute
  * the drift.
  */
object DetectProbe {
  def main(args: Array[String]): Unit = {
    val trials = if (args.length > 0) args(0).toInt else 5
    val nFlows = if (args.length > 1) args(1).toInt else 7500
    val nBots = if (args.length > 2) args(2).toInt else 500
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "detect-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    sys.env.getOrElse("SPARK_GRAFT_PRELOAD", "").split(',').map(_.trim).foreach {
      case "events" =>
        graft.io.Tables.events(spark, sfDir).count(); ()
      case "simhash" =>
        SparkEntry.queries("d4_simhash_pairs")(spark, sfDir).count()
        spark.catalog.clearCache()
      case "queries" =>
        SparkEntry.queries.foreach { case (n, fn) =>
          try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
          spark.catalog.clearCache()
        }
      case _ => ()
    }

    val sc = Fixtures.scenario(Fixtures.ScenarioParams(
      nBenignFlows = nFlows, nBots = nBots))
    val flows = sc.flows.toDF().cache()
    flows.count()
    val proc = new graft.util.ProcCpu // per-trial load evidence, as in Bench
    for (t <- 1 to trials) {
      val cpu0 = proc.snap()
      val t0 = System.nanoTime()
      val n = Detect.detect(flows).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"detect_batch trial $t: $n rows in $dt%.3f s " +
        f"(foreign load ${proc.othersCores(cpu0, proc.snap())}%.2f cores)")
    }
    spark.stop()
  }
}
