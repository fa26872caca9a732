package graft

/** Phase-attribution probe for the optimization rounds: times the PHASES
  * inside the composite bench rows (index build / append / delete /
  * compact / query; BPE phase-one vs rounds; postings build vs scorer)
  * so an optimization targets the phase the seconds actually live in,
  * per the measure-first discipline. Diagnostic main, never part of any
  * query path. Usage:
  *   tools/run.sh graft.OptProbe <family> [sfDir] [trials]
  * Families: ivf, bpe, lex, d2, d7.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val family = args.headOption.getOrElse("ivf")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val trials = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "opt-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(body: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to trials) {
        val t0 = System.nanoTime()
        body
        best = best.min((System.nanoTime() - t0) / 1e9)
        spark.catalog.clearCache()
      }
      println(f"$name%-28s $best%8.3f s")
    }

    family match {
      case "jobs" =>
        // per-job breakdown of one buildIvfIndex + one ivfTopKIndexed
        import graft.queries.SimQueries._
        import graft.sim.Similarity
        val base = new java.io.File("target/optprobe_ivf").getAbsolutePath
        val e = clustered(spark, sfDir)
        e.cache().count()
        Similarity.buildIvfIndex(e, ClusterCentPred, Dim, base) // warm
        val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            starts.put(js.jobId, System.nanoTime()); ()
          }
          override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.remove(je.jobId)
            jobs.add((je.jobId, System.nanoTime() - s)); ()
          }
        })
        def dump(tag: String)(body: => Unit): Unit = {
          jobs.clear()
          val t0 = System.nanoTime()
          body
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200)
          import scala.jdk.CollectionConverters._
          val js = jobs.asScala.toSeq.sortBy(_._1)
          println(f"== $tag: wall $wall%.3f s, ${js.size} jobs, " +
            f"job-sum ${js.map(_._2).sum / 1e9}%.3f s")
          js.foreach { case (id, ns) => println(f"  job $id%4d  ${ns / 1e9}%7.3f s") }
        }
        dump("build_float") {
          Similarity.buildIvfIndex(e, ClusterCentPred, Dim, base)
        }
        dump("query_indexed") {
          Similarity.ivfTopKIndexed(spark, base, e.filter(QueryPred), K, NProbe)
            .count(); ()
        }
        dump("build_pq") {
          Similarity.buildIvfIndex(e, ClusterCentPred, Dim, base,
            storage = "pq", pqM = PqM, pqK = PqK)
        }

      case "ivf" =>
        import graft.queries.SimQueries._
        import graft.sim.Similarity
        val base = new java.io.File("target/optprobe_ivf").getAbsolutePath
        val e = clustered(spark, sfDir)
        e.cache().count()
        // warmup one full cycle
        Similarity.buildIvfIndex(e, ClusterCentPred, Dim, base)
        t("build_float") {
          Similarity.buildIvfIndex(e, ClusterCentPred, Dim, base)
        }
        t("build_pq") {
          Similarity.buildIvfIndex(e, ClusterCentPred, Dim, base,
            storage = "pq", pqM = PqM, pqK = PqK)
        }
        Similarity.buildIvfIndex(e, ClusterCentPred, Dim, base)
        t("query_indexed") {
          Similarity.ivfTopKIndexed(spark, base, e.filter(QueryPred), K, NProbe)
            .count(); ()
        }
        t("refine_only") {
          val cents = e.filter(ClusterCentPred)
            .select(org.apache.spark.sql.functions.col("vec_id").as("cid"),
              org.apache.spark.sql.functions.col("embedding").as("cv0"))
          Similarity.refineCentroids(e, cents, Dim).count(); ()
        }
        t("build_half") {
          Similarity.buildIvfIndex(e.filter(InitPred), ClusterCentPred, Dim, base)
        }
        t("append_half") {
          Similarity.buildIvfIndex(e.filter(InitPred), ClusterCentPred, Dim, base)
          val t0 = System.nanoTime()
          Similarity.appendToIvfIndex(e.filter(s"NOT ($InitPred)"), base)
          println(f"  append alone: ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        }
        t("compact") {
          Similarity.buildIvfIndex(e.filter(InitPred), ClusterCentPred, Dim, base)
          Similarity.appendToIvfIndex(e.filter(s"NOT ($InitPred)"), base)
          val t0 = System.nanoTime()
          Similarity.compactIvfIndex(spark, base)
          println(f"  compact alone: ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        }
        t("delete") {
          Similarity.buildIvfIndex(e, ClusterCentPred, Dim, base)
          val t0 = System.nanoTime()
          Similarity.deleteFromIvfIndex(spark, base,
            e.filter(DeletePred).select("vec_id"))
          println(f"  delete alone: ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        }

      case "bpe" =>
        import graft.text.BpeTrain
        val docs = graft.io.Tables.documents(spark, sfDir)
        t("wordfreq_checkpoint") {
          BpeTrain.wordFreq(docs).localCheckpoint(true).count(); ()
        }
        val wf = BpeTrain.wordFreq(docs)
        println("  vocab rows: " + wf.count() +
          ", partitions: " + wf.rdd.getNumPartitions)
        t("learn_64_seq") { BpeTrain.learn(docs, 64); () }
        t("learn_64_batched") { BpeTrain.learnBatched(docs, 64); () }

      case "lex" =>
        import graft.text.Lexical
        import graft.queries.RetrievalQueries._
        val docs = graft.io.Tables.documents(spark, sfDir)
        val base = new java.io.File("target/optprobe_postidx").getAbsolutePath
        t("postings_build") { Lexical.buildPostingsIndex(docs, base) }
        t("indexed_query") {
          Lexical.bm25TopKIndexed(spark, base, Queries, K).count(); ()
        }
        import spark.implicits._
        t("bm25_topk_direct") {
          Lexical.bm25TopK(docs, Queries.toDF("q_id", "qtext"), K).count(); ()
        }

      case "d2" =>
        import graft.dedup.Dedup
        val docs = graft.io.Tables.documents(spark, sfDir)
        t("shingles_persist") {
          val s = Dedup.docShingles(docs, 3)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          s.count(); s.unpersist(true); ()
        }
        t("jaccard_pairs_full") {
          val r = Dedup.jaccardPairs(docs)
          r.count(); r.unpersist(true); ()
        }
        t("minhash_lsh_full") {
          val r = Dedup.minhashLsh(docs)
          r.count(); r.unpersist(true); ()
        }
        t("minhash_sigs") {
          Dedup.minhashSignatures(docs, 3, 32).count(); ()
        }

      case "bpe2" =>
        // per-round latency anatomy: the same top-pair aggregate the learn
        // loop runs, 32 rounds, under conf variants — measures the per-job
        // floor the 64-round learners pay
        import graft.text.BpeTrain
        val docs = graft.io.Tables.documents(spark, sfDir)
        val vocab = BpeTrain.wordFreq(docs)
          .withColumn("sym", org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.col("word"), "(.)", "($1)"))
          .select("freq", "sym")
          .localCheckpoint(true)
        def round(): Unit = {
          import org.apache.spark.sql.functions._
          vocab
            .select(col("freq"), explode(
              org.apache.spark.sql.functions.transform(
                when(size(split(regexp_replace(col("sym"), "^\\(|\\)$", ""), "\\)\\(")) >= 2,
                  sequence(lit(1), size(split(regexp_replace(col("sym"), "^\\(|\\)$", ""), "\\)\\(")) - 1))
                  .otherwise(array().cast("array<int>")),
                i => struct(
                  element_at(split(regexp_replace(col("sym"), "^\\(|\\)$", ""), "\\)\\("), i).as("a"),
                  element_at(split(regexp_replace(col("sym"), "^\\(|\\)$", ""), "\\)\\("), i + 1).as("b")))).as("p"))
            .groupBy(col("p.a").as("a"), col("p.b").as("b"))
            .agg(sum(col("freq")).as("cnt"))
            .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
            .limit(1)
            .collect(); ()
        }
        round() // warm
        def loop(tag: String): Unit = {
          val t0 = System.nanoTime()
          for (_ <- 1 to 32) round()
          println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9 / 32}%8.4f s/round")
        }
        loop("default")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        loop("aqe_off")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        loop("aqe_off_shuf1")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        loop("aqe_on_shuf1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        loop("aqe_off_shuf1_nocodegen")
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")

      case "d7" =>
        val fn = SparkEntry.queries("d7_dup_clusters")
        t("d7_full") { fn(spark, sfDir).count(); () }

      case other => sys.error(s"unknown family $other")
    }
    spark.stop()
  }
}
