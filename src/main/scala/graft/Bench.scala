package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line of per-query seconds. Execution is forced through
  * the noop sink — a `count()` would let Catalyst prune projections and
  * drop sorts, under-measuring projection-heavy queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JVM, codegen, shuffle machinery, parquet footer
    // cache, noop sink) so the first measured query reflects the query,
    // not startup. The bounded pipeline touches every engine surface the
    // suite leans on — scan, decimal-exact agg, window, broadcast join —
    // so their one-time costs (codegen templates, broadcast infra, window
    // exec classes) stop landing on whichever query runs first.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(5000)
      val agg = li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), graft.ops.Exact.dsum(col("l_quantity")).as("s"))
      val w = Window.partitionBy("l_returnflag").orderBy("n")
      agg.withColumn("rnk", row_number().over(w))
        .join(broadcast(agg.select(col("l_returnflag"), col("n").as("n2"))),
          "l_returnflag")
        .write.format("noop").mode("overwrite").save()
    }
    // Optional comma-separated name filter for local iteration; the
    // driver never sets it, so the recorded bench always covers everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.registry.filter(q => names(q.name))
      case None        => SparkEntry.registry
    }
    // Median-of-N per query (SPARK_GRAFT_BENCH_REPS, default 3): this
    // box's ambient drift is ±25% on single shots (SCALE.md variance
    // record — same-code totals observed 105.7-134.3s), so a one-shot
    // record whipsaws round-over-round. The median absorbs a single
    // slow rep; set reps=1 for quick local iteration.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    // Per-query: median over successful reps; a rep that throws counts as
    // an ERROR, never as a timing. Round 7 recorded 22 broken queries'
    // time-to-exception (~0.1 s each) as if they ran, silently deflating
    // the suite total by ~25 s — errors must be visible, not fast.
    val results: Seq[(String, Seq[Double], Int)] = selected.map { q =>
      var errReps = 0
      val times = (1 to reps).flatMap { _ =>
        // Isolate reps/queries from each other's leftovers before
        // starting the clock. Round 3 showed a uniform +0.5-1.2s drift
        // on ~20 small queries as the suite grew; round 5 showed a 7.4x
        // spike on the query following a localCheckpoint-heavy one. Both
        // trace to ASYNC cleanup (GC-driven ContextCleaner block
        // removal) landing inside the next query's timed region, so
        // release everything synchronously here instead:
        // blocking-unpersist every persistent RDD (this covers
        // localCheckpoint block pins — they register as cached RDDs),
        // drop cached plans, then let one explicit GC queue whatever
        // tiny refs remain (broadcast stubs) for the cleaner.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        try {
          q.impl(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          errReps += 1
          System.err.println(s"[bench] ${q.name}: $e")
          None
        }
      }
      (q.name, times, errReps)
    }
    // The driver captures a bounded 2000-char tail of the output, so the
    // line must stay well inside it (rounds 2 and 3 overflowed and
    // recorded parsed=null). Per-query times are a positional ARRAY in
    // registration order (index i ↔ SparkEntry.registry(i).name — the
    // same order CORRECTNESS lists, minus sorting): at 160 queries the
    // old `"qNN":t` object format could not fit, the array version stays
    // under ~1200 chars (EntrySmokeSpec guards the arithmetic). A value
    // of -1 marks a query whose every rep errored; partially-errored
    // queries keep their successful-rep median and appear in "errors"
    // (short name → failed-rep count), which is {} on a clean run.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    // centisecond per-query precision: ambient drift is ±25%, so 10 ms
    // granularity loses nothing real and keeps the line short.
    def fmtQ(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.2f", v)
    def med(r: (String, Seq[Double], Int)): Double =
      if (r._2.nonEmpty) median(r._2) else -1.0
    // a BENCH_ONLY-filtered run breaks the positional index↔registry
    // mapping, so emit the old name-keyed object format there (the char
    // budget only binds on the unfiltered full run the driver records)
    val qs =
      if (only.isDefined)
        results.map(r => "\"" + r._1 + "\":" + fmtQ(med(r))).mkString("{", ",", "}")
      else results.map(r => fmtQ(med(r))).mkString("[", ",", "]")
    val errs = results.filter(_._3 > 0).map { case (n, _, e) =>
      "\"" + n.takeWhile(_ != '_') + "\":" + e
    }.mkString("{", ",", "}")
    val total = results.map(med).filter(_ >= 0).sum
    // Full per-query dispersion goes to a FILE (the stdout line is
    // capture-bounded): one JSON object per query with min/median/max
    // over successful reps, so docs can cite run-to-run spread from the
    // artifact instead of session memory (VERDICT r8: BASELINE.md's
    // q131 "4.6-7.8 s" claim contradicted the recorded 12.07 s — range
    // claims must come from a recorded artifact).
    // Never from a BENCH_ONLY-filtered iteration run, which would
    // silently clobber the committed full-suite artifact with a subset.
    if (only.isEmpty) {
      val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
      val detail = results.map { case (n, ts, e) =>
        val s = ts.sorted
        val (mn, md, mx) =
          if (s.isEmpty) (-1.0, -1.0, -1.0) else (s.head, median(s), s.last)
        s"""{"name":"$n","min":${fmtQ(mn)},"median":${fmtQ(md)},"max":${fmtQ(mx)},"err_reps":$e}"""
      }.mkString("[\n", ",\n", "\n]")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath),
        s"""{"reps":$reps,"sf":"$sfDir","total_median":${fmt(total)},"queries":$detail}\n""")
    }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,"errors":$errs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
