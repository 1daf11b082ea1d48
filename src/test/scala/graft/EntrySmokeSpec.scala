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
    // Round 19 took the documented tightening step — per-query stdout
    // values are integer DECISECONDS (exact 2-decimal second medians
    // travel in BENCH_DETAIL.json's by_name) — so worst case per query
    // is "99999," = 6 chars (a 10 000 s median would mean a hung query,
    // not a slow box). Prefix worst case ≈ 310: the round-18 fields
    // (`"core100"`, `"audit"`, `"ambient_suspect"`, the four pre-run
    // `calib_*_ms`, `"qorder_md5"`, `"errors"`) plus round 19's
    // `"build":NNNNN.NN` (+17) and `"calib_post":[N,N,N,N]` (+40 — the
    // four post-run brackets as one compact array; full names live in
    // the detail file).
    val line = 310 + SparkEntry.registry.size * 6 + 40
    // 1800 keeps headroom against the ~1900 usable budget to ~240
    // registered queries; the next tightening step beyond that is
    // dropping the positional array from stdout entirely (QORDER.json +
    // BENCH_DETAIL.json already carry the per-query data by index and
    // by name).
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

  test("BuildQueries stay registered and deliberate (headline exclusion must not orphan them)") {
    // same contract as the audit tier: build members keep RUNNING every
    // bench; membership changes reshape the headline's meaning and must
    // stay a documented act (Bench Scaladoc + BASELINE.md arithmetic)
    val registered = SparkEntry.registry.map(_.name).toSet
    val missing = Bench.BuildQueries -- registered
    assert(missing.isEmpty,
      s"build members missing from the registry: ${missing.toSeq.sorted.mkString(", ")}")
    assert(Bench.BuildQueries == Set(
      "q202_lsh_bucketed_corpus", "q203_lsh_persisted_index",
      "q204_ivf_persisted_index", "q205_ivf_appended_index",
      "q206_lsh_appended_index", "q207_pq_persisted_index",
      "q208_ivfpq_persisted_index", "q209_ivfpq_adc_rerank",
      // round 20: the delete certifications re-train + re-write index
      // tables every run (the q205/q206 pattern) — documented in
      // OPTIMIZATION_r20.md's tier note
      "q215_ivf_deleted_index", "q216_ivfpq_tombstoned_index"),
      "build tier membership changed — update the Bench Scaladoc + BASELINE.md contract language")
    // every read-only twin's builder must be registered BEFORE it (the
    // twins read tables their builders write; registration order is the
    // only thing guaranteeing builder-before-twin on unfiltered drives)
    val order = SparkEntry.registry.map(_.name).zipWithIndex.toMap
    Seq("q210_lsh_index_read" -> "q203_lsh_persisted_index",
        "q211_ivf_index_read" -> "q204_ivf_persisted_index",
        "q212_ivfpq_index_read" -> "q208_ivfpq_persisted_index")
      .foreach { case (twin, builder) =>
        assert(order(builder) < order(twin),
          s"$twin must register after its builder $builder")
      }
  }

  test("every query runs on sf0.001 and returns rows") {
    val dir = "/root/testdata/sf0.001"
    // REGISTRATION order, not map order: the read-only index twins
    // (q210–q212) read tables their builders write earlier in the
    // registry — an unordered map sweep could run a twin first
    SparkEntry.registry.foreach { q =>
      val n = q.impl(spark, dir).count()
      assert(n > 0, s"query ${q.name} returned 0 rows")
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
