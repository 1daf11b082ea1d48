package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Pin

/** Graph construction + ranking for corpus/catalog curation — the
  * "importance from structure" stage a 100 TB pipeline runs over link,
  * citation, or co-occurrence graphs (host authority for quality
  * filtering, product centrality, query-click graphs).
  *
  * [[coOccurrenceEdges]] builds the classic market-basket graph: items
  * sharing a group become symmetric neighbors. The self-join is WITHIN a
  * group only — quadratic in lines-per-group (bounded, e.g. ≤7 lineitems
  * per TPC-H order), never in table size.
  *
  * [[pageRank]] is the simplified PageRank iteration (Brin & Page 1998;
  * dangling mass leaks rather than redistributes — documented, standard
  * for fixed-iteration ranking) in N-NORMALIZED form — ranks start at
  * 1.0 and sum to ≈N, so rank_{t+1}(v) = (1-d) + d * Σ_{u→v}
  * rank_t(u)/outdeg(u) needs no global node count anywhere (true
  * PageRank = this / N). Each per-node inbound sum is grid-snapped into
  * an exact decimal aggregation (the `graft.ops.Exact.gsum` idiom at a 1e-10
  * grid — normalized contributions sit near 1/outdeg, so the fine grid
  * keeps ~9 significant digits while DECIMAL(38,0) still has integer
  * headroom for any realistic in-degree mass), so every iteration is
  * bit-deterministic under any partitioning and replays in any engine
  * with the same ANSI expression tree — a plain double sum would drift
  * in the low bits and diverge over iterations.
  *
  * Scale shape: edges pinned once with outdeg attached; one shuffle per
  * iteration (groupBy dst, map-side combined) plus an equi-join of the
  * |nodes|-row rank frame; rank state never exceeds one row per node and
  * is pinned per iteration to truncate lineage. No driver-side state.
  */
object Graph {

  /** Auto-gate threshold for broadcasting per-node frames (ranks,
    * degrees, triangle counts): one (id, numeric) row per node is
    * ~16–24 B serialized, so 10^7 nodes ≈ 200 MB — comfortably inside
    * executor memory on the cluster shapes this engine targets, and two
    * orders of magnitude under the point where a forced broadcast OOMs.
    * Beyond it the joins degrade to sort-merge instead of failing —
    * same threshold-guard pattern as `Dedup.dupGroups`.
    */
  val BroadcastNodeLimit: Long = 10000000L

  /** Auto-gate threshold for broadcasting the oriented adjacency frame
    * of [[triangleCounts]] (≈8 bytes per edge of array payload →
    * ~0.8 GB at the limit).
    */
  val BroadcastEdgeLimit: Long = 100000000L

  /** Symmetric co-occurrence edges (src, dst): distinct item pairs that
    * share a group, both directions, self-pairs excluded.
    *
    * `distinctPairs = false` skips the cross-group pair dedup (one
    * ~|pairs|-row shuffle) and emits one row per (group, pair) instead —
    * correct whenever the consumer dedups anyway, e.g. [[pageRank]]'s
    * adjacency `collect_set` or [[triangleCounts]]'s canonicalizing
    * `distinct` (round-8 q131 measurement: the dedup was pure overlap).
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        distinctPairs: Boolean = true): DataFrame =
    if (distinctPairs) {
      // the distinct pair set is the expensive part — compute it once,
      // then symmetrize (two references of a post-distinct frame replan
      // only the cheap final exchange's output, and the distinct is
      // needed anyway)
      val pairs = coOccurrencePairs(df, groupCol, itemCol, distinctPairs = true)
      pairs.unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
    } else {
      // Round 20: the union-of-two-references form replanned (and
      // re-RAN) the whole groupBy(g)+pair-explode subtree once per
      // direction — Spark replans, not reuses, each textual reference.
      // Emit BOTH directions in the one explode instead: for item x at
      // index ix, dsts = s minus x — each ordered pair exactly once,
      // identical multiset to pairs ∪ swapped(pairs), one subtree.
      val sets = df.select(col(groupCol).as("g"), col(itemCol).as("i"))
        .groupBy("g").agg(array_sort(collect_set(col("i"))).as("s"))
      sets
        .select(explode(expr(
          "flatten(transform(s, (x, ix) -> " +
            "transform(concat(slice(s, 1, ix), slice(s, ix + 2, size(s))), " +
            "y -> struct(x AS src, y AS dst))))"))
          .as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"))
    }

  /** Per-source adjacency of the co-occurrence graph, built WITHOUT
    * materializing pair rows (round 20, guide §2.3/§2.4): the
    * symmetric-edge path emits k(k−1) (src, dst) struct rows per group
    * through a nested double-transform explode, then [[pageRank]]
    * immediately re-groups them into per-source arrays — two heavy
    * generated expressions and a pair-row exchange just to arrive at
    * adjacency state. This fusion explodes each group's sorted item set
    * ONCE into k (item, rest-of-set) rows and unions the per-group
    * neighbor arrays in the adjacency aggregate directly, so the
    * exchange carries k array-payload rows per group instead of k(k−1)
    * struct rows (same element count, ~k× fewer row headers) and the
    * codegen surface shrinks to slice/flatten/array_distinct (measured
    * at sf0.1/local[32]: q131 cold rep 34.7 → 17.1 s, second rep —
    * the bench-median regime — 13.9 → 4.9 s). Same adjacency set as
    * `coOccurrenceEdges(distinctPairs = false)` + `collect_set`:
    * per-group rests never contain the item itself, and the
    * array_distinct mirrors collect_set's cross-group dedup.
    */
  def coOccurrenceAdjacency(df: DataFrame, groupCol: String,
                            itemCol: String): DataFrame = {
    val sets = df.select(col(groupCol).as("g"), col(itemCol).as("i"))
      .groupBy("g").agg(array_sort(collect_set(col("i"))).as("s"))
    sets
      .select(col("s"), posexplode(col("s")).as(Seq("ix", "src")))
      .select(col("src"),
        concat(slice(col("s"), lit(1), col("ix")),
          slice(col("s"), col("ix") + 2, size(col("s")))).as("ns"))
      // singleton groups contribute an empty rest-array; dropping those
      // rows pre-shuffle both prunes the exchange and keeps the node
      // set identical to the pair-explode form, which never emits an
      // item that co-occurs with nothing (an empty-adj source would
      // also be an outdeg-0 division in the rank iteration)
      .filter(size(col("ns")) > 0)
      .groupBy("src")
      .agg(array_distinct(flatten(collect_list(col("ns")))).as("adj"))
      .withColumn("outdeg", size(col("adj")).cast("long"))
  }

  /** The undirected pair set behind [[coOccurrenceEdges]]: distinct
    * (src < dst) item pairs sharing a group — half the rows of the
    * symmetric form, the natural input for undirected algorithms like
    * [[triangleCounts]].
    */
  def coOccurrencePairs(df: DataFrame, groupCol: String, itemCol: String,
                        distinctPairs: Boolean = true): DataFrame = {
    // ONE map-side-combined groupBy to per-group sorted item sets, then
    // the i<j pairs explode in the projection — the equivalent self-join
    // costs two exchanges plus the join; this costs one exchange and the
    // within-group quadratic work happens on the bounded array.
    val sets = df.select(col(groupCol).as("g"), col(itemCol).as("i"))
      .groupBy("g").agg(array_sort(collect_set(col("i"))).as("s"))
    val exploded = sets
      .select(explode(expr(
        "flatten(transform(s, (x, ix) -> " +
          "transform(slice(s, ix + 2, size(s)), y -> struct(x AS src, y AS dst))))"))
        .as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
    if (distinctPairs) exploded.distinct() else exploded
  }

  /** Contribution grid: ROUND(x * 1e10) captured into DECIMAL(38,0) —
    * exact, associative, order-invariant; /1e10 back to double. ANSI
    * twin: `CAST(SUM(CAST(ROUND(x * 10000000000.0, 0) AS DECIMAL(38,0)))
    * AS DOUBLE) / 10000000000.0`. Valid for |x| < 2^53/1e10 ≈ 9e5.
    */
  private def gsum10(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(round(c * 1.0e10, 0).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .cast("double") / 1.0e10

  /** Exact triangle counts per node over undirected edges — accepts the
    * symmetric form or the (src < dst) pair form interchangeably (the
    * first step canonicalizes to distinct pairs) — plus the local
    * clustering coefficient (Watts & Strogatz 1998). Returns
    * (id, deg, n_tri, clustering) for every node.
    *
    * Degree-ordered orientation + edge iterator (the "forward"
    * algorithm, Schank & Wagner 2005; ordering analysis Latapy 2008):
    * each undirected edge points from the lower (deg, id) endpoint to
    * the higher, so every out-adjacency list is O(√m); each triangle
    * closes at exactly its lowest-ranked edge as the intersection of
    * the two endpoints' out-lists. Total intersection work is the same
    * O(m^1.5) bound as wedge generation, independent of hub skew — but
    * NOTHING quadratic ever materializes as rows: a wedge-explode
    * formulation was measured 4× slower here on a dense co-occurrence
    * graph (36M wedge rows vs 1.2M per-edge intersections at sf0.1).
    *
    * Scale shape: degrees broadcast onto the edge stream (like
    * [[pageRank]]'s rank frame — one (id, long) row per node); the
    * oriented adjacency frame is one O(√m)-long array per node (≈8m
    * bytes total). Both broadcasts are AUTO-GATED on measured counts
    * (the frames are pinned, so the counts are cheap re-scans, not
    * recomputations): degrees broadcast while nodes ≤
    * `broadcastNodeLimit`, adjacency while edges ≤ `broadcastEdgeLimit`
    * (~10^8 — ≈0.8 GB of arrays). Under the gates the whole triangle
    * pass is a single scan over the pinned edge stream with two
    * broadcast probes and zero wedge shuffles; beyond them the
    * attachments degrade to u- then v-keyed shuffle joins — the
    * standard giant-graph trade, now taken automatically instead of by
    * a caller flag (`broadcastDeg`/`broadcastAdj` = Some(…) force a
    * path for tests). Only ids and bounded arrays cross exchanges;
    * triangle corners collapse to per-node counts in ONE pass (explode
    * of the 3-corner array — a unionAll of three selects would replay
    * the whole triangle join per corner).
    */
  def triangleCounts(edges: DataFrame,
                     broadcastDeg: Option[Boolean] = None,
                     broadcastAdj: Option[Boolean] = None,
                     broadcastNodeLimit: Long = BroadcastNodeLimit,
                     broadcastEdgeLimit: Long = BroadcastEdgeLimit,
                     pairsCanonical: Boolean = false): DataFrame = {
    // `pairsCanonical = true`: the caller certifies the input is
    // already the distinct (src < dst) pair set (e.g.
    // [[coOccurrencePairs]] with distinctPairs = true), so the
    // canonicalizing filter+distinct — a full exchange of the pair
    // stream that re-derives what the producer just built — is skipped
    // (round 20, guide §2.4 "a distinct on data that is already
    // unique"). GraphSpec pins both forms to identical counts.
    val und = Pin.pin(
      if (pairsCanonical) edges.select(col("src"), col("dst"))
      else edges.filter(col("src") < col("dst"))
        .select(col("src"), col("dst")).distinct())
    val deg = Pin.pin(und.select(col("src").as("id"))
      .unionAll(und.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg")))
    val bDeg = broadcastDeg.getOrElse(deg.count() <= broadcastNodeLimit)
    val bAdj = broadcastAdj.getOrElse(und.count() <= broadcastEdgeLimit)
    val d = if (bDeg) broadcast(deg) else deg
    // orientation key (deg, id) — struct comparison keeps ids generic
    // (numeric or string), and ids are unique so the key never ties
    val withRanks = und
      .join(d.select(col("id").as("src"), col("deg").as("dsrc")), "src")
      .join(d.select(col("id").as("dst"), col("deg").as("ddst")), "dst")
      .select(col("src"), col("dst"),
        (struct(col("dsrc"), col("src")) < struct(col("ddst"), col("dst")))
          .as("fwd"))
    val oriented = Pin.pin(withRanks.select(
      when(col("fwd"), col("src")).otherwise(col("dst")).as("u"),
      when(col("fwd"), col("dst")).otherwise(col("src")).as("v")))
    // per-node oriented out-list — the O(√m)-bounded adjacency array;
    // out-lists are sets (edges deduped above), so array_intersect
    // below yields each closing corner exactly once
    val adj = Pin.pin(oriented.groupBy("u")
      .agg(collect_list(col("v")).as("ns")))
    val a = if (bAdj) broadcast(adj) else adj
    // each triangle (a<b<c by rank) closes at edge (a,b) only: w ∈
    // N⁺(u) ∩ N⁺(v) means u→w and v→w, and no other triangle edge can
    // see the third corner in BOTH out-lists
    val tri = oriented
      .join(a.select(col("u"), col("ns").as("nsu")), Seq("u"))
      .join(a.select(col("u").as("v"), col("ns").as("nsv")), Seq("v"))
      .select(col("u"), col("v"),
        explode(expr("array_intersect(nsu, nsv)")).as("w"))
    val perNode0 = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    // one (id, long) row per triangle-bearing node — same size regime
    // as the degree frame, so it broadcasts under the same flag and the
    // readout join needs no exchange
    val perNode = if (bDeg) broadcast(perNode0) else perNode0
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clustering",
        when(col("deg") >= 2,
          col("n_tri").cast("double") /
            (col("deg").cast("double") * (col("deg") - 1).cast("double") / 2.0))
          .otherwise(lit(0.0)))
  }

  /** Fixed-iteration simplified PageRank over (src, dst) edges, in
    * N-normalized form. Returns (id, rank) with mean rank ≈ 1. Nodes =
    * src ∪ dst; a node with no in-edges keeps the teleport rank (1-d),
    * a node with no out-edges contributes nothing.
    *
    * `broadcastRanks` (default None = auto): the rank frame is one
    * (id, double) row per node — while the MEASURED node count (the
    * node frame is pinned, so the count is a cheap re-scan) stays ≤
    * `broadcastNodeLimit`, each iteration is a broadcast hash join with
    * NO sort, leaving the groupBy(dst) exchange as the only
    * per-iteration shuffle. Beyond the limit the auto-gate drops the
    * hint and the join falls back to sort-merge (a per-iteration sort —
    * the standard giant-graph trade, taken automatically: a forced hint
    * on a billion-node rank vector would OOM the build side instead of
    * degrading). Some(true)/Some(false) force a path for tests.
    *
    * `adjacencyForm` (default true): edge state is pinned as one
    * (src, adj: array<dst>, outdeg) row per SOURCE — built in a single
    * map-side-combined groupBy (collect_set dedups (src,dst) for free,
    * outdeg = array size, so the old repartition + in-partition dedup +
    * window-sort prep collapses to one exchange with no sort), and each
    * iteration joins the broadcast rank frame against |sources| rows
    * instead of |edges| rows before exploding straight into the
    * aggregation. Round-8 measurement on the q131 co-occurrence graph
    * (sf0.1, local[4]): 23.1 s → see BENCH_r08 — the per-iteration join
    * input shrinks ~90×. The trade is per-source adjacency arrays: fine
    * whenever max out-degree is bounded (co-occurrence, citation,
    * host-link graphs); for web-scale HUB graphs (a source with 10^7+
    * out-neighbors makes a pathological array row) set
    * `adjacencyForm = false` to keep edge state in row form — same
    * results (GraphSpec pins both paths to the same fixture ranks).
    */
  def pageRank(edges: DataFrame, damping: Double = 0.85, iters: Int = 3,
               broadcastRanks: Option[Boolean] = None,
               adjacencyForm: Boolean = true,
               broadcastNodeLimit: Long = BroadcastNodeLimit): DataFrame = {
    if (adjacencyForm) {
      val adj = edges.select(col("src"), col("dst"))
        .groupBy("src").agg(collect_set(col("dst")).as("adj"))
        .withColumn("outdeg", size(col("adj")).cast("long"))
      pageRankFromAdjacency(adj, damping, iters, broadcastRanks,
        broadcastNodeLimit)
    } else {
      // Row-form fallback for hub-skewed graphs: ONE exchange for the
      // whole edge prep — repartition by src, then dedup and outdeg both
      // run under that partitioning (the (src,dst) dropDuplicates needs
      // only (src,dst)-clustering, which hash(src) already provides, and
      // the outdeg count window needs src-clustering). The pinned frame
      // stays HASH-PARTITIONED BY src; the only per-iteration edge-stream
      // exchange is the intrinsic groupBy(dst) aggregation.
      val e = Pin.pin(edges.select(col("src"), col("dst"))
        .repartition(col("src"))
        .dropDuplicates("src", "dst")
        .withColumn("outdeg",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("src"))))
      val nodes = Pin.pin(
        e.select(col("src").as("id"))
          .unionAll(e.select(col("dst").as("id"))).distinct())
      val bcast = broadcastRanks.getOrElse(nodes.count() <= broadcastNodeLimit)
      var rank = nodes.withColumn("rank", lit(1.0))
      for (i <- 1 to iters) {
        val r = if (bcast) broadcast(rank) else rank
        val inbound = e.join(r, col("src") === col("id"))
          .select(col("dst"), (col("rank") / col("outdeg")).as("x"))
          .groupBy("dst").agg(gsum10(col("x")).as("s"))
        val next = nodes
          .join(inbound, col("id") === col("dst"), "left")
          .select(col("id"),
            (lit(1.0 - damping) +
              lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
        // same last-iteration pin skip as the adjacency form (round 20)
        rank = if (i == iters) next else Pin.pin(next)
      }
      rank
    }
  }

  /** The adjacency-form [[pageRank]] iteration over an already-built
    * (src, adj: array<dst>, outdeg) frame — the shared tail of the
    * edge-list path above and of [[coOccurrenceAdjacency]]'s fused
    * build (round 20): callers that can produce adjacency state
    * directly skip the pair-row exchange entirely. Pins the adjacency
    * (reused every iteration) and derives nodes from the PINNED frame —
    * deriving from the raw input would replay the whole build a second
    * time. Iteration shape unchanged: broadcast-gated rank join, one
    * map-side-combined groupBy(dst) exchange per iteration, exact
    * 1e-10-grid inbound sums, intermediate-rank pins with the
    * last-iteration skip.
    */
  def pageRankFromAdjacency(adjacency: DataFrame, damping: Double = 0.85,
                            iters: Int = 3,
                            broadcastRanks: Option[Boolean] = None,
                            broadcastNodeLimit: Long = BroadcastNodeLimit): DataFrame = {
    val adj = Pin.pin(adjacency.select(col("src"), col("adj"), col("outdeg")))
    val nodes = Pin.pin(
      adj.select(col("src").as("id"))
        .unionAll(adj.select(explode(col("adj")).as("id"))).distinct())
    val bcast = broadcastRanks.getOrElse(nodes.count() <= broadcastNodeLimit)
    var rank = nodes.withColumn("rank", lit(1.0))
    for (i <- 1 to iters) {
      val r = if (bcast) broadcast(rank) else rank
      val inbound = adj.join(r, col("src") === col("id"))
        .select(explode(col("adj")).as("dst"),
          (col("rank") / col("outdeg")).as("x"))
        .groupBy("dst").agg(gsum10(col("x")).as("s"))
      val next = nodes
        .join(inbound, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
      // pin intermediate ranks (each is re-executed by the next
      // iteration's broadcast build AND referenced by its join), but
      // never the LAST one — it flows straight to the single output
      // consumer, so its pin was one pure-overhead materialization
      // job per query (round 20)
      rank = if (i == iters) next else Pin.pin(next)
    }
    rank
  }
}
