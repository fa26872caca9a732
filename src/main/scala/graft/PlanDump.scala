package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for every SparkEntry query to files —
  * the optimization-round evidence trail (plans/rNN/<query>_<tag>.txt).
  * The formatted plan carries PushedFilters/ReadSchema per scan, the
  * join strategies and every Exchange, which is what a plan-diff claim
  * is checked against. Usage:
  *   tools/run.sh graft.PlanDump <outDir> <tag> [sfDir] [nameFilter...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [sfDir] [names...]")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val only: Set[String] = args.drop(3).toSet
    Files.createDirectories(outDir)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"${name}_$tag.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"wrote $name")
        spark.catalog.clearCache()
      } catch { case e: Throwable =>
        println(s"$name ERROR ${e.toString.takeWhile(_ != '\n').take(160)}")
      }
    }
    spark.stop()
  }
}
