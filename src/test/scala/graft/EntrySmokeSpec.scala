package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("worst-case Bench JSON line fits the driver's 2000-char capture window") {
    // Rounds 2 and 3 both overflowed the window (parsed=null); round 8
    // switched per-query times to a positional array in registration
    // order, which removes the per-query key overhead entirely. Guard
    // the arithmetic as the registry grows: prefix + "999.99," per query
    // + suffix must stay inside the ~1900 usable budget with headroom
    // (the window also has to fit sbt's trailing [success] line).
    // Round 16 took the documented tightening step — per-query stdout
    // precision dropped to 1 decimal (exact 2-decimal medians travel in
    // BENCH_DETAIL.json's by_name) — so worst case per query is
    // "9999.9," = 7 chars (4 integer digits: a 1000+ s median is
    // plausible for the O(n²) audit members on a slow box — ADVICE
    // r16's undercount fix). Prefix includes `"core100":NNN.NN` (+20),
    // `"audit":NN.NN` (+16), `"ambient_suspect":false` (+24), the
    // round-16 fields `"calib_cpu_ms":NNNNN` (+21),
    // `"calib_query_ms":NNNNN` (+23), `"qorder_md5":"deadbeef"` (+24),
    // round 17's `"calib_cpu_ms_post":NNNNN` (+26), and round 18's
    // `"calib_par_ms":NNNNN` (+21) + `"calib_bw_ms":NNNNN` (+20).
    val line = 175 + 135 + SparkEntry.registry.size * 7 + 40
    // 1800 keeps headroom against the ~1900 usable budget at the
    // current ~220-query scale; the next tightening step if the registry
    // passes ~220 is moving the positional array to integer centiseconds.
    assert(line < 1800, s"bench line worst case $line chars; tighten format")
    // error keys (rare) still use the short qNN prefix — keep it unique
    val short = SparkEntry.registry.map(_.name.takeWhile(_ != '_'))
    assert(short.distinct.size == short.size, "short qNN keys must stay unique")
  }

  test("CoreQueries stays a frozen 100-name subset of the registry") {
    // core100 is only round-over-round comparable if membership never
    // drifts: a renamed/deleted registered query would silently drop out
    // of the sum and fake an engine speedup (queries HAVE been removed
    // before — the q10/q17/q31 gaps). Enforce both halves mechanically.
    assert(Bench.CoreQueries.size == 100,
      s"core100 must stay exactly 100 names, got ${Bench.CoreQueries.size}")
    val registered = SparkEntry.registry.map(_.name).toSet
    val missing = Bench.CoreQueries -- registered
    assert(missing.isEmpty,
      s"core100 members missing from the registry: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("AuditQueries stay registered (headline exclusion must not orphan them)") {
    // The audit tier is excluded from the headline total but its members
    // must keep RUNNING — a renamed/deleted audit query would silently
    // make "audit" sum fewer plans while the headline looked unchanged.
    val registered = SparkEntry.registry.map(_.name).toSet
    val missing = Bench.AuditQueries -- registered
    assert(missing.isEmpty,
      s"audit members missing from the registry: ${missing.toSeq.sorted.mkString(", ")}")
    // exhaustive baselines only: adding a member here reshapes the
    // headline total's meaning — it must stay a deliberate, documented act
    assert(Bench.AuditQueries == Set("q77_jaccard_pairs", "q170_lsh_recall_audit"),
      "audit tier membership changed — update the Bench Scaladoc + BASELINE.md contract language")
  }

  test("entry (flagship disaggregation) returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query runs on sf0.001 and returns rows") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("disaggregated shares sum to 1 per month (M24 invariant)") {
    import org.apache.spark.sql.functions._
    val df = queries.Disaggregate.query(spark, "/root/testdata/sf0.001")
    val bad = df.groupBy("mon").agg(sum("share").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9).count()
    assert(bad === 0)
  }
}
