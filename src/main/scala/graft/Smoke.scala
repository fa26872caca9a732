package graft

/** Mirrors the driver's t1 smoke: build a bare session the way the driver
  * would, call SparkEntry.entry, require rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows=$n cols=${df.columns.mkString(",")}")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
