package graft.text

/** Throwaway diagnostic: accepted-batch-size trajectory of
  * [[BpeTrain.learnBatched]] as merge count grows — evidence for where
  * the batching win materializes (PLANS.md known-costs).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val merges = if (args.length > 1) args(1).toInt else 512
    val spark = graft.GraftSession.local(8, "bpe-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val (rules, stats) = BpeTrain.learnBatchedStats(docs, merges)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"merges=${rules.length} rounds=${stats.rounds} " +
      f"meanBatch=${stats.meanBatch}%.2f wall=$dt%.1f s")
    spark.stop()
  }
}
