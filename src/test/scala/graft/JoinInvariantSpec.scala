package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Generate, GlobalLimit, LocalLimit, LocalRelation, LogicalPlan, Range => LRange, ResolvedHint}
import org.apache.spark.sql.execution.{GenerateExec, GlobalLimitExec, LocalLimitExec, LocalTableScanExec, RangeExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide enforcement of the SCALE.md join invariant — the join twin
  * of [[WindowInvariantSpec]]: no registered query may plan a
  * CartesianProduct or a BroadcastNestedLoopJoin whose unbounded sides
  * make it quadratic in fact rows at corpus scale.
  *
  * The rule is asymmetric, matching the cost model:
  *   - CartesianProductExec multiplies BOTH inputs → both sides must be
  *     provably bounded;
  *   - BroadcastNestedLoopJoinExec costs |stream| × |build| per scan →
  *     the BUILD (broadcast) side must be provably bounded; the stream
  *     side may be the fact table (that is the legitimate broadcast
  *     range/theta-join shape, e.g. value-vs-bin joins).
  *
  * Mechanical boundedness, per physical subtree:
  *   - LocalTableScanExec (driver-built pinned fixtures) — bounded;
  *   - a grouping-less aggregate (1 row by construction) — bounded;
  *   - Global/LocalLimit — bounded (≤ k, or ≤ k × partitions);
  *   - bounded-range RangeExec — bounded (driver literals);
  *   - GenerateExec (explode) — NOT bounded even over a bounded child: a
  *     1-row collect_list aggregate explodes back to fact cardinality —
  *     exactly the shape this spec must not bless mechanically (a real
  *     bounded explode belongs in the whitelist with its reasoning);
  *   - any other node: bounded iff ALL children are bounded (a join or
  *     union with one fact-sized branch is fact-sized);
  *   - a leaf that is none of the above (a file scan) — unbounded.
  *
  * Anything flagged must appear in the explicit whitelist below with a
  * reviewed justification, or this spec fails — a new query that plans a
  * scan×scan cartesian fails here before it ships.
  */
class JoinInvariantSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** name → reviewed justification for keeping an unbounded-side nested
    * loop / cartesian in the plan. Every entry is a broadcast build side
    * that IS bounded by construction but whose bound the classifier
    * cannot prove mechanically (a literal filter, a per-group top-k, a
    * pinned sample).
    */
  private val whitelist: Map[String, String] = Map(
    "q41_cosine_topk" ->
      ("cosineTopK's brute-force baseline: the BNLJ build side is the " +
        "broadcast QUERY frame (vec_id < 20 literal filter, ≤ 20 rows); " +
        "a filter on a scan is not mechanically bounded, but the query " +
        "set is a bounded external input by contract — the corpus-scale " +
        "path is LSH/IVF (q45/q66), this is their exactness baseline"),
    "q185_lsh_recall_at_k" ->
      ("recall audit: the exact-top-k reference side reuses q41's " +
        "brute-force pairing against the broadcast ≤ 10-row query frame " +
        "(vec_id < 10 literal filter) — the audit needs the exact answer " +
        "to measure recall against"),
    "q186_ivf_recall_at_k" ->
      ("same as q185: the exact reference pairing against the broadcast " +
        "≤ 10-row literal-filtered query frame"),
    "q187_pq_recall_at_k" ->
      ("same as q185/q186: the exact-L2 reference pairing against the " +
        "broadcast ≤ 10-row literal-filtered query frame"),
    "q120_pq_ann" ->
      ("the packed ADC scan (round 14): the BNLJ build side is the " +
        "per-query flat lookup-table aggregate — one row per QUERY " +
        "(grouped from the m×k-rows-per-query broadcast-joined table), " +
        "bounded by the query-batch contract exactly like q41's frame; " +
        "a grouped aggregate is not mechanically bounded, but its " +
        "grouping key is the bounded external query id"),
    "q207_pq_persisted_index" ->
      ("q120's persisted-index sibling: the same packed ADC scan whose " +
        "BNLJ build side is the per-query flat lookup-table aggregate — " +
        "one row per QUERY (vec_id < 3 literal filter), bounded by the " +
        "query-batch contract; the scanned side is the persisted codes " +
        "table, which streams"),
    "q123_semantic_decon" ->
      ("the build side is the pinned stratified EVAL sample (2 vectors " +
        "per label, ≤ 2×|labels| rows by the rn ≤ 2 window); Pin " +
        "materializes it as an RDD scan the classifier cannot see " +
        "through — eval sets are bounded by contract"),
    "q134_kmv_overlap" ->
      ("group-pair sketch comparison: both sides are per-group bottom-k " +
        "KMV sketch aggregates (≤ |groups| rows, k = 256 hashes each); " +
        "the pairwise nested loop is over group summaries, never rows"),
    "q153_rrf_fusion" ->
      ("the fusion join's sides are two two-stage top-k outputs " +
        "(≤ 50 rows each — the same bound WindowInvariantSpec's " +
        "whitelist reviews for this query's rank window)"))

  private def bounded(p: SparkPlan): Boolean = p match {
    case _: LocalTableScanExec => true
    case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
    case _: GlobalLimitExec => true
    case _: LocalLimitExec => true
    case _: RangeExec => true
    case _: GenerateExec => false
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(bounded)
  }

  /** The flagged nested-loop/cartesian joins of a physical plan, with a
    * short reason each.
    */
  private def violations(plan: SparkPlan): Seq[String] = plan.collect {
    case c: CartesianProductExec
        if !(bounded(c.left) && bounded(c.right)) =>
      val sides = Seq(
        if (bounded(c.left)) None else Some("left"),
        if (bounded(c.right)) None else Some("right")).flatten
      s"CartesianProduct with unbounded ${sides.mkString("+")} side"
    case b: BroadcastNestedLoopJoinExec
        if !bounded(b.buildSide match {
          case BuildLeft => b.left
          case BuildRight => b.right
        }) =>
      "BroadcastNestedLoopJoin with unbounded build side"
  }

  test("no registered query plans an unbounded cartesian/nested-loop join") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan =
        try q.impl(spark, dir).queryExecution.sparkPlan
        catch { case e: Throwable =>
          fail(s"${q.name}: impl failed during planning at $dir: $e")
        }
      val bad = violations(plan)
      if (bad.nonEmpty && !whitelist.contains(q.name))
        Some(s"${q.name}: ${bad.mkString("; ")}")
      else None
    }
    assert(offenders.isEmpty,
      s"unbounded cartesian/nested-loop joins (add to whitelist only with " +
        s"a reviewed justification): ${offenders.mkString(", ")}")
  }

  // ---- forced-broadcast invariant (VERDICT r11 item 2) ----
  // A `broadcast()` hint removes AQE's freedom to fall back to a shuffle
  // join when the build side turns out big at runtime — acceptable only
  // when the hinted frame is provably bounded BY CONSTRUCTION (a limit,
  // a grouping-less aggregate, a driver-built local relation), never on
  // a data-dependent set (dup-group ids, seed lists, near-dup losers):
  // those scale with the corpus and a forced hint turns "degrades to a
  // shuffle" into "OOMs the build side".

  /** name → reviewed justification for a broadcast hint whose subtree the
    * classifier cannot prove bounded but which IS bounded by an external
    * contract (a fixed dimension table, a bounded query/eval set).
    */
  private val broadcastWhitelist: Map[String, String] = Map(
    "q07_join_broadcast" ->
      ("the hinted frames are the TPC-H nation (25 rows) and region " +
        "(5 rows) dimension tables — fixed-size by schema contract, the " +
        "canonical broadcast-dimension shape"),
    "q139_triangle_count" ->
      ("Graph.triangleCounts auto-gates both hints on MEASURED counts " +
        "(deg ≤ BroadcastNodeLimit, edges ≤ BroadcastEdgeLimit) before " +
        "hinting — the hint only exists when the runtime count proved " +
        "the bound; above the gate the joins degrade to shuffles"),
    "q131_coorder_pagerank" ->
      ("Graph.pageRank auto-gates the per-iteration rank-frame hint on " +
        "the MEASURED count of the pinned node frame " +
        "(≤ BroadcastNodeLimit — one (id, double) row per node) — the " +
        "q139 rationale; above the gate the join degrades to " +
        "sort-merge. The hint was always here: it only became VISIBLE " +
        "to this sweep when round 20 stopped pinning the final " +
        "iteration's rank frame (the pin truncated the analyzed plan " +
        "at a LogicalRDD leaf)"),
    "q177_retention_cohorts" ->
      ("the hinted cohort-size frame is one row per cohort MONTH — " +
        "bounded by the data's calendar span, not its row count"),
    "q179_quota_sample" ->
      ("the hinted quota frame is one row per language label — bounded " +
        "by the language-ID label domain (~hundreds), not corpus size"),
    "q117_dsir_selection" ->
      ("the hinted DSIR profile is grouped by pmod(hash, buckets) — " +
        "≤ `buckets` (1024) rows by construction of the modulus"),
    "q130_cms_heavy_hitters" ->
      ("the hinted CMS counter table is grouped by (row, pmod(hash, " +
        "width)) — ≤ depth×width (4×1024) cells by construction however " +
        "big the input stream"),
    "q107_decontaminate" ->
      ("the hinted frame is the distinct n-gram set of the BENCHMARK " +
        "side — eval suites are bounded external inputs by contract " +
        "(the corpus side streams)"),
    "q123_semantic_decon" ->
      ("the hinted build side is the pinned stratified eval sample " +
        "(rn ≤ 2 per label) — same bounded-eval-set contract the BNLJ " +
        "whitelist entry reviews"),
    "q41_cosine_topk" ->
      ("the hinted frame is the ≤ 20-row query set (vec_id < 20 " +
        "literal filter) — bounded external query input by contract"),
    "q45_ann_topk" ->
      ("same bounded query-set contract as q41 (literal-filtered " +
        "≤ 20-row query frame)"),
    "q66_ivf_ann" ->
      ("same bounded query-set contract as q41"),
    "q78_ivf_full_probe" ->
      ("same bounded query-set contract as q41"),
    "q85_lsh_full_coverage" ->
      ("same bounded query-set contract as q41"),
    "q202_lsh_bucketed_corpus" ->
      ("q85's bucketed-corpus twin: the hinted frames are the same " +
        "literal-filtered ≤ 10-row query set (vec_id < 10), read from " +
        "the bucketed catalog table instead of the parquet scan"),
    "q203_lsh_persisted_index" ->
      ("q202's persisted-index sibling: the same bounded query-set " +
        "contract, query frame read from the bucketed corpus table"),
    "q204_ivf_persisted_index" ->
      ("the persisted-IVF drive: the hinted frames are the bounded " +
        "query batch (vec_id < 10 from the bucketed corpus table) in " +
        "both the probe join and the re-rank — the q41 contract"),
    "q205_ivf_appended_index" ->
      ("q204's delta-append sibling: the same bounded query batch " +
        "(vec_id < 10 from the bucketed corpus table) hinted in the " +
        "probe join and both re-rank stages — the q41 contract; the " +
        "appended CELLS side is never hinted"),
    "q206_lsh_appended_index" ->
      ("q203's delta-append sibling: the same bounded query-set " +
        "contract (vec_id < 10 from the bucketed corpus table); the " +
        "appended index side is never hinted"),
    "q120_pq_ann" ->
      ("same bounded query-set contract as q41 (plus the PQ codebook, " +
        "k×m centroid rows by construction)"),
    "q207_pq_persisted_index" ->
      ("q120's persisted-index sibling: the hinted frames are the " +
        "≤ 3-row query set (vec_id < 3 literal filter), its per-query " +
        "lookup-table aggregate, and the persisted codebook table " +
        "(m×k rows by the pqCodebook build contract — the model " +
        "artifact, not data); the codes table side is never hinted"),
    "q208_ivfpq_persisted_index" ->
      ("q204's IVFPQ sibling: the hinted frames are the bounded query " +
        "batch (vec_id < 10 from the bucketed corpus table) carrying " +
        "its per-(query, probed cell) RESIDUAL ADC lookup tables — one " +
        "row per (query, probed cell), ≤ |queries|·nProbe by " +
        "construction — plus the nCells-row centroid frame the " +
        "residuals re-base against, in the probe join and both re-rank " +
        "stages; the cells side is never hinted"),
    "q209_ivfpq_adc_rerank" ->
      ("q208's exact residual-ADC audit twin: the same bounded " +
        "query-batch frames (vec_id < 3) re-based per probed cell " +
        "(≤ |queries|·nProbe rows), the per-(query, cell, j, code) " +
        "decimal table (≤ |queries|·nProbe·m·k rows by the codebook " +
        "contract), and the nCells-row centroid frame — all " +
        "model/query-bounded; the cells side is never hinted"),
    "q210_lsh_index_read" ->
      ("q203's read-only from-index twin (same query half, no build): " +
        "the same bounded query-set contract, query frame read from " +
        "the bucketed corpus table the builder wrote"),
    "q211_ivf_index_read" ->
      ("q204's read-only from-index twin: the same bounded query batch " +
        "(vec_id < 10 from the bucketed corpus table) hinted in the " +
        "probe join and re-rank — the q41 contract; the cells side is " +
        "never hinted"),
    "q212_ivfpq_index_read" ->
      ("q208's read-only from-index twin: the same bounded query batch " +
        "carrying its per-(query, probed cell) residual ADC tables " +
        "(≤ |queries|·nProbe rows) plus the nCells-row centroid frame; " +
        "the cells side is never hinted"),
    "q213_ivf_filtered_topk" ->
      ("q211's predicate-constrained variant: the hinted frames are " +
        "the SAME bounded query batch (vec_id < 10) in the probe join " +
        "and re-rank; the allowed-id restriction is an UNHINTED " +
        "left-semi join on the cells side (AQE sizes it), so neither " +
        "the cells table nor the metadata-derived id frame is forced"),
    "q214_ivfpq_filtered_topk" ->
      ("q212's predicate-constrained variant: the same bounded query " +
        "batch carrying its per-(query, probed cell) residual ADC " +
        "tables plus the nCells-row centroid frame; the allowed-id " +
        "left-semi join on the cells side is unhinted"),
    "q215_ivf_deleted_index" ->
      ("q204's delete-rewrite twin: the same bounded query batch " +
        "(vec_id < 10) hinted in the probe join and re-rank; the " +
        "bucketedDelete anti-join runs in the builder side-effect and " +
        "is unhinted (AQE sizes the id frame)"),
    "q216_ivfpq_tombstoned_index" ->
      ("q208's tombstone twin: the same bounded query-batch residual " +
        "ADC frames plus the nCells-row centroid frame; the tombstone " +
        "left-anti join on the cells side is unhinted"),
    "q153_rrf_fusion" ->
      ("the hinted sides are two two-stage top-k outputs (≤ 50 rows — " +
        "the bound WindowInvariantSpec reviews for this query)"),
    "q185_lsh_recall_at_k" ->
      ("recall audit: hinted frames are the ≤ 10-row query set and the " +
        "exact-reference top-k derived from it — both query-set-bounded"),
    "q186_ivf_recall_at_k" ->
      ("same query-set-bounded audit frames as q185"),
    "q187_pq_recall_at_k" ->
      ("same query-set-bounded audit frames as q185"),
    "q155_weather_capstone" ->
      ("the hinted frames are the station inventory (fixed reference " +
        "dimension input, ~100k rows worldwide by contract) and the " +
        "12-row monthly target frame"),
    "q195_bigram_fluency" ->
      ("LangModel auto-gates the model-count-frame hints on the " +
        "MEASURED row count of the already-pinned gram frame " +
        "(<= BroadcastModelLimit, the q139 pattern) — the hint only " +
        "exists because the runtime count proved the bound; above the " +
        "gate the joins degrade to AQE-sized shuffles"),
    "q196_fluency_buckets" ->
      ("same measured-count auto-gate as q195 (shared ngramScored core)"),
    "q197_trigram_fluency" ->
      ("same measured-count auto-gate as q195 (shared ngramScored core)"),
    "q201_fivegram_fluency" ->
      ("same measured-count auto-gate as q195 (shared ngramScored core)"),
    "q199_nb_quality_classifier" ->
      ("Classifier auto-gates the class-count-frame hint on the " +
        "MEASURED row count of the already-pinned stats frame " +
        "(<= LangModel.BroadcastModelLimit) — the q195 rationale on " +
        "the NB chain"),
    "q200_classifier_acceptance" ->
      ("same measured-count auto-gate as q199 (shared nbScored core)"))

  /** Logical-plan twin of [[bounded]]: hints are only visible on the
    * analyzed plan (the optimizer folds ResolvedHint into JoinHint), so
    * the forced-broadcast sweep classifies logical subtrees.
    */
  private def boundedLogical(p: LogicalPlan): Boolean = p match {
    case _: LocalRelation => true
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case _: GlobalLimit => true
    case _: LocalLimit => true
    case _: LRange => true
    case _: Generate => false
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(boundedLogical)
  }

  private def forcedBroadcasts(plan: LogicalPlan): Seq[String] = plan.collect {
    case h: ResolvedHint
        if h.hints.strategy.contains(BROADCAST) && !boundedLogical(h.child) =>
      s"forced broadcast hint on unbounded subtree (${h.child.nodeName})"
  }

  test("no registered query forces a broadcast hint on an unbounded side") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan =
        try q.impl(spark, dir).queryExecution.analyzed
        catch { case e: Throwable =>
          fail(s"${q.name}: impl failed during analysis at $dir: $e")
        }
      val bad = forcedBroadcasts(plan)
      if (bad.nonEmpty && !broadcastWhitelist.contains(q.name))
        Some(s"${q.name}: ${bad.mkString("; ")}")
      else None
    }
    assert(offenders.isEmpty,
      s"forced broadcast hints on data-dependent sides (drop the hint and " +
        s"let AQE size the join, or whitelist with a reviewed bound): " +
        s"${offenders.mkString(", ")}")
  }

  test("the forced-broadcast classifier flags a hinted scan (self-test)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val bad = ev.join(broadcast(ev.select(col("event_id").as("e2"))),
      col("event_id") === col("e2"))
    assert(forcedBroadcasts(bad.queryExecution.analyzed).nonEmpty,
      "the sweep would miss a forced broadcast of a raw scan")
    // …but blesses the 1-row-aggregate and limit shapes
    val tot = ev.agg(sum(col("value")).as("tot"))
    assert(forcedBroadcasts(
      ev.crossJoin(broadcast(tot)).queryExecution.analyzed).isEmpty,
      "1-row aggregate hint misclassified")
    val top = ev.orderBy(col("value").desc).limit(10)
      .select(col("event_id").as("e2"))
    assert(forcedBroadcasts(
      ev.join(broadcast(top), col("event_id") === col("e2"))
        .queryExecution.analyzed).isEmpty,
      "limit-bounded hint misclassified")
  }

  test("whitelist carries no stale entries") {
    val names = SparkEntry.registry.map(_.name).toSet
    val stale = (whitelist.keys ++ broadcastWhitelist.keys)
      .filterNot(names.contains)
    assert(stale.isEmpty, s"whitelisted queries no longer registered: $stale")
  }

  test("the classifier flags a scan-by-scan cartesian (self-test)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val bad = ev.crossJoin(ev.select(col("event_id").as("e2")))
    assert(violations(bad.queryExecution.sparkPlan).nonEmpty,
      "the sweep would miss a real scan-by-scan cartesian regression")

    // …and does NOT flag the legitimate broadcast-bounded shapes: a
    // 1-row aggregate crossJoined onto a fact table (the grand-total
    // attach)…
    val tot = ev.agg(sum(col("value")).as("tot"))
    val ok1 = ev.crossJoin(broadcast(tot))
    assert(violations(ok1.queryExecution.sparkPlan).isEmpty,
      "1-row-aggregate crossJoin misclassified as a violation")

    // …and a driver-built bin frame nested-loop-joined on a range
    // predicate (the q157-style value-vs-bin theta join)
    import spark.implicits._
    val bins = Seq((0, 0.0, 10.0), (1, 10.0, 1e9)).toDF("bin", "lo", "hi")
    val ok2 = ev.join(broadcast(bins),
      col("value") >= col("lo") && col("value") < col("hi"))
    assert(violations(ok2.queryExecution.sparkPlan).isEmpty,
      "broadcast bin theta-join misclassified as a violation")
  }
}
