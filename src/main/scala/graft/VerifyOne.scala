package graft

import org.apache.spark.sql.SparkSession

/** Subset correctness dump: like [[Verify]] but only the named queries —
  * for iterating on one oracle row without the full 113-query sweep.
  *
  * Usage: tools/run.sh graft.VerifyOne <sfDir> <outDir> <name> [name ...]
  * then: tools/parity.py <sfDir> <outDir> <name> [name ...]
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifyOne <sfDir> <outDir> <name...>")
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "verify-one")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(s"[verify-one] wrote $outDir/$name")
    }
    val sqls = SparkEntry.oracleSql.filter { case (k, _) => names.contains(k) }
    val json = sqls.map { case (k, v) =>
      "\"" + k + "\": \"" + v.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
