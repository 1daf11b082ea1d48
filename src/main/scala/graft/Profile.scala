package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scratch profiling / plan-audit main (not part of the driver contract).
  * Round 15: which stage holds the PQ exact-encode straggler (VERDICT
  * r14 item 7 — 68.6 s wall at 1M, 65.9 s of it ONE task doing the
  * decimal argmin)? Prints a per-stage task histogram for the
  * exact-encode pqTopK, then A/Bs the straggler fix.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART_SIZE", "64k"))
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-stage: task count, max task ms, sum task ms, sum GC ms
    val stageStats = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long, Long)]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) {
          val gc = if (t.taskMetrics != null) t.taskMetrics.jvmGCTime else 0L
          stageStats.merge(t.stageId,
            (1, t.taskInfo.duration, t.taskInfo.duration, gc),
            (a, b) => (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3, a._4 + b._4))
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stageNames.put(s.stageInfo.stageId,
          s.stageInfo.name.takeWhile(_ != '\n').take(80))
    })

    def time[A](name: String)(f: => A): A = {
      stageStats.clear(); stageNames.clear()
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      // listener events arrive ASYNCHRONOUSLY on the bus — without a
      // settle, tail onTaskEnd/onStageCompleted events from the just-
      // timed job can be missed or bleed into the NEXT measurement, and
      // these histograms are diagnostic instruments (they re-diagnosed
      // the r14 PQ "straggler"). Same drain ScaleStress uses (ADVICE
      // r15; listenerBus.waitUntilEmpty is private[spark]).
      Thread.sleep(1500)
      import scala.jdk.CollectionConverters._
      stageStats.asScala.toSeq.sortBy(_._1).foreach { case (sid, (cnt, mx, sm, gc)) =>
        if (mx > 500 || sm > 2000)
          println(f"  stage $sid%4d tasks=$cnt%4d max=${mx / 1000.0}%7.1fs " +
            f"sum=${sm / 1000.0}%8.1fs gc=${gc / 1000.0}%8.1fs  " +
            stageNames.getOrDefault(sid, "?"))
      }
      r
    }

    val mode = if (args.length > 1) args(1) else "pq"
    if (mode == "q") {
      // round 20: per-stage histogram of any registered query (bench
      // shape — noop sink, cache-clear+GC between reps). args(0) is
      // unused; args(2) = comma-separated name substrings; sf dir from
      // SPARK_GRAFT_SF_DIR (default sf0.1).
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      graft.SparkEntry.registry
        .filter(qq => names.exists(qq.name.contains)).foreach { qq =>
        (1 to 3).foreach { i =>
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          spark.catalog.clearCache()
          System.gc()
          time(s"${qq.name} rep$i") {
            qq.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
        }
      }
      spark.stop(); return
    }
    if (mode == "explain") {
      // round 20: dump .explain("formatted") for named queries to
      // plans/r20/<name>_<suffix>.txt (args(2) = name substrings,
      // args(3) = suffix, default "after"). Used for the optimization
      // round's before/after plan evidence.
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
      val suffix = if (args.length > 3) args(3) else "after"
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      graft.SparkEntry.registry
        .filter(qq => names.exists(qq.name.contains)).foreach { qq =>
        val plan = qq.impl(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get("plans", "r20", s"${qq.name}_$suffix.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, plan)
        println(s"wrote $p (${plan.length} chars)")
      }
      spark.stop(); return
    }
    if (mode == "nb") {
      // round-15: the classifier decade's 200k anomaly — one task is
      // ~80% of a 9-26 s wall at a flat 2.65 MB shuffle. Which stage?
      import org.apache.spark.sql.functions._
      def docs(nd: Long) = spark.range(nd).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(59)),
          i => concat(lit("w"), translate(
            pmod(xxhash64(col("id"), i), lit(5000)).cast("string"),
            "0123456789", "abcdefghij"))), " ").as("text"),
        (pmod(xxhash64(col("id"), lit(11L)), lit(10)) < 3).as("pos"))
      def body(nd: Long): Long =
        graft.text.Classifier.nbQuality(docs(nd), "doc_id", "text",
          isPos = col("pos")).count()
      body(20000L) // warm
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      (1 to 3).foreach { i =>
        time(s"nb_classifier n=$n rep$i") { body(n) }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
      spark.stop(); return
    }
    import graft.sim.Similarity
    val dim = 64; val m = 8; val k = 16; val topK = 10
    def emb = graft.tools.ScaleStress.annEmbeddings(spark, n, dim)
    def qs = graft.tools.ScaleStress.annEmbeddings(spark, 64L, dim)
    // warm
    Similarity.pqTopK(graft.tools.ScaleStress.annEmbeddings(spark, 20000L, dim),
      graft.tools.ScaleStress.annEmbeddings(spark, 8L, dim),
      "vec_id", "embedding", m, k, dim, topK).count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    time("pqTopK exact-encode (audit)") {
      Similarity.pqTopK(emb, qs, "vec_id", "embedding", m, k, dim, topK).count()
    }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    time("pqTopK fast-encode (production)") {
      Similarity.pqTopK(emb, qs, "vec_id", "embedding", m, k, dim, topK,
        exactEncode = false).count()
    }
    spark.stop()
  }
}
