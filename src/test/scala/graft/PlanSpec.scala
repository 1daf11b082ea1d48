package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the fast plans the engine relies on at
  * scale, asserted on the actual physical plans at sf0.001. A failure
  * here usually means a refactor silently dropped a pushdown, a
  * broadcast, or re-derived a pinned subtree — the classes of regression
  * a row-count test cannot see.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filter+project scan pushes predicates into the parquet reader (q02)") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(!p.contains("PushedFilters: []"), s"empty pushdown in:\n$p")
  }

  test("dimension joins broadcast the small side (q07)") {
    val p = plan("q07_join_broadcast")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"no broadcast in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dimension join shuffled both sides:\n$p")
  }

  test("cosine top-k ranks on ids + one double, not vectors (q41)") {
    val p = plan("q41_cosine_topk")
    // the stage-1 exchange that feeds the ranking window must carry only
    // (query_id, neighbor_id, dcos) — vectors re-attach after the filter
    val exchanges = p.split("Exchange hashpartitioning\\(query_id")
    assert(exchanges.length >= 2, s"no per-query exchange in:\n$p")
    assert(p.contains("WindowGroupLimit"), s"rank limit not pushed into window:\n$p")
  }

  test("exact dedup shuffles fingerprints, never text (q39)") {
    val p = plan("q39_exact_dedup")
    // what crosses the shuffle is the map-side partial aggregate's output
    // row — it must be (fingerprint, partials), never the document text
    val partialOut = "partial_min[^\\n]*output=\\[([^\\]]*)\\]".r
      .findFirstMatchIn(p).map(_.group(1))
    assert(partialOut.isDefined, s"no partial aggregate before the shuffle in:\n$p")
    assert(!partialOut.get.contains("text#"),
      s"document text crosses the shuffle: ${partialOut.get}")
  }
}
