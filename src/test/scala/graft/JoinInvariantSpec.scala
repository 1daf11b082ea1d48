package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
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

  test("whitelist carries no stale entries") {
    val names = SparkEntry.registry.map(_.name).toSet
    val stale = whitelist.keys.filterNot(names.contains)
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
