package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.ops.TopK

/** Mergeable sketches for corpus-scale profiling — the operations that
  * replace exact global aggregation when the answer only needs to be
  * approximately right but the input is 100 TB:
  *
  *  - [[kmvDistinct]]: distinct-count estimation (KMV / bottom-k,
  *    Bar-Yossef et al. 2002) — "how many distinct tokens / URLs per
  *    language" without a global distinct of the raw keys;
  *  - [[cmsHeavyHitters]]: count-min sketch frequency estimation
  *    (Cormode & Muthukrishnan 2005) — biased-up counts for probe keys
  *    from a fixed (depth × width) table of counters.
  *
  * Both are built on [[Dedup.md5Hash64]] identities, so every register /
  * order statistic is deterministic under any partitioning AND
  * replayable bit-for-bit by the DuckDB oracle — unlike
  * `approx_count_distinct`'s HLL++, whose registers are Spark-private.
  * All aggregation is map-side combinable (min/sum), shuffles carry
  * 8-byte hashes, never keys.
  */
object Sketch {

  /** K-minimum-values distinct-count estimate per group.
    *
    * The k smallest 64-bit hash values of the group's distinct keys
    * locate the k-th order statistic r_k in the unsigned hash space;
    * uniformity gives E[distinct] ≈ (k-1) / (r_k / 2^64). Groups with
    * fewer than k distinct keys fall back to their exact count (the
    * sketch IS the full set there — standard KMV).
    *
    * Output: (groupCol, k, kth_min — the exact order statistic, so the
    * compare pins the sketch state, not just the estimate —, n_exact for
    * the quality row, est_distinct). The estimate is one fixed-
    * association double expression over exactly-representable constants
    * (2^63, 2^64), identical in any IEEE engine.
    *
    * Scale shape: distinct on (group, 8-byte hash) — one map-side-
    * combined shuffle, keys never leave the scan — then the two-stage
    * top-k, so a dominant group never funnels through one task. State is
    * k longs per group; sketches from disjoint corpus shards merge by
    * "union, keep k smallest" for free (bottom-k of a union is the
    * bottom-k of the bottom-ks).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int = 256): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val dh = df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("g"), Dedup.md5Hash64(col(keyCol)).as("h"))
      .distinct()
      .transform(graft.ops.Pin.pin) // feeds both the top-k and n_exact
    val kth = TopK.topKPerKey(dh, Seq("g"), Seq(col("h")), k, "rn")
      .groupBy("g").agg(max(col("h")).as("kth_min"), count(lit(1)).as("n_in_sketch"))
    val exact = dh.groupBy("g").agg(count(lit(1)).as("n_exact"))
    kth.join(exact, "g")
      .withColumn("est_distinct",
        when(col("n_in_sketch") < k, col("n_exact").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            ((col("kth_min").cast("double") + lit(9.223372036854775808e18)) /
              lit(1.8446744073709551616e19))))
      .select(col("g").as(groupCol), lit(k.toLong).as("k"), col("kth_min"),
        col("n_exact"), col("est_distinct"))
  }

  /** Per-group KMV sketch STATE: (groupCol, sk — the k smallest 64-bit
    * key hashes, ascending). The unit other sketch ops build on: states
    * from disjoint shards combine with [[kmvMerge]] and read out with
    * [[kmvEstimate]], so a maintained stats table never rescans history.
    */
  def kmvState(df: DataFrame, groupCol: String, keyCol: String,
               k: Int = 256): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val dh = df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("g"), Dedup.md5Hash64(col(keyCol)).as("h"))
      .distinct()
    TopK.topKPerKey(dh, Seq("g"), Seq(col("h")), k, "rn")
      .groupBy("g").agg(sort_array(collect_list(col("h"))).as("sk"))
      .select(col("g").as(groupCol), col("sk"))
  }

  /** Merge law: bottom-k of a union is the bottom-k of the bottom-ks. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Distinct-count readout from sketch state (exact when |sk| < k). */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        ((element_at(sk, size(sk)).cast("double") + lit(9.223372036854775808e18)) /
          lit(1.8446744073709551616e19)))

  /** Pairwise distinct-set OVERLAP estimates between groups, from KMV
    * sketch state alone — the join-cardinality / corpus-overlap
    * estimation technique: for groups A and B, merge their bottom-k
    * sketches, keep the k smallest of the union (the union's own KMV
    * sketch K), and count κ = |K ∩ S_A ∩ S_B|. Then κ/k estimates the
    * Jaccard of the two DISTINCT-key sets, (k-1)/(r_k/2^64) estimates
    * |A ∪ B|, and their product estimates |A ∩ B| — no pass over the
    * raw data beyond the one sketch build (Beyer et al., SIGMOD 2007).
    *
    * Output: (g_a, g_b, kappa, k, union_kth — exact sketch state —,
    * est_union, est_jaccard, est_intersection) for every unordered
    * group pair, plus exact n_common for the quality row. The pair
    * computation is a self-join of ONE ROW PER GROUP (bounded by group
    * count, never by data); array math runs in codegen on LONG arrays.
    */
  def kmvOverlap(df: DataFrame, groupCol: String, keyCol: String,
                 k: Int = 256): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val dh = df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("g"), Dedup.md5Hash64(col(keyCol)).as("h"))
      .distinct()
      .transform(graft.ops.Pin.pin)
    val sk = TopK.topKPerKey(dh, Seq("g"), Seq(col("h")), k, "rn")
      .groupBy("g").agg(sort_array(collect_list(col("h"))).as("sk"))
      .transform(graft.ops.Pin.pin)
    val a = sk.select(col("g").as("g_a"), col("sk").as("sk_a"))
    val b = sk.select(col("g").as("g_b"), col("sk").as("sk_b"))
    val pairs = a.join(b, col("g_a") < col("g_b"))
      .withColumn("ku", slice(array_sort(array_union(col("sk_a"), col("sk_b"))),
        1, k))
      .withColumn("kappa",
        size(array_intersect(array_intersect(col("ku"), col("sk_a")), col("sk_b")))
          .cast("long"))
      .withColumn("keff", size(col("ku")).cast("long")) // < k ⇒ ku IS the union
      .withColumn("union_kth", element_at(col("ku"), size(col("ku"))))
      .withColumn("est_union",
        when(col("keff") < k, col("keff").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            ((col("union_kth").cast("double") + lit(9.223372036854775808e18)) /
              lit(1.8446744073709551616e19))))
      .withColumn("est_jaccard", col("kappa").cast("double") / col("keff").cast("double"))
      .withColumn("est_intersection", col("est_jaccard") * col("est_union"))
    // exact overlap for the quality row: one self-join of the distinct
    // hash stream, group-pair counting on 8-byte keys
    val exact = dh.as("x").join(dh.as("y"),
        col("x.h") === col("y.h") && col("x.g") < col("y.g"))
      .groupBy(col("x.g").as("g_a"), col("y.g").as("g_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs.join(exact, Seq("g_a", "g_b"), "left")
      .select(col("g_a"), col("g_b"), col("kappa"), lit(k.toLong).as("k"),
        col("union_kth"), col("est_union"), col("est_jaccard"),
        col("est_intersection"), coalesce(col("n_common"), lit(0L)).as("n_common"))
  }

  /** HyperLogLog register frame (g, bucket, reg) per group (Flajolet,
    * Fusy, Gandouet & Meunier, AofA 2007): bucket = top p hash bits,
    * reg = max over the group's distinct keys of ρ(w) — the position of
    * the first 1-bit in the remaining 64-p bits. ρ is computed exactly
    * as (64-p+1) - bitlength(w) via the engine's binary-string length
    * (`bin`), which any SQL engine replays without leading-zero
    * intrinsics. Registers merge across shards by per-bucket max —
    * the HLL mergeability property, pinned by SketchSpec.
    *
    * KMV (q129/q136) stays the suite's primary distinct sketch because
    * its state is a plain order statistic; HLL trades that simplicity
    * for O(m) fixed state per group at ~1.04/√m relative error.
    */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String,
                   p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, "HLL precision p in [4,16]")
    hllRegistersFromHashes(
      df.filter(col(keyCol).isNotNull)
        .select(col(groupCol).as("g"), Dedup.md5Hash64(col(keyCol)).as("h"))
        .distinct(), p)
  }

  /** Registers from an already-hashed distinct (g, h) frame — shuffles
    * carry 8-byte hashes only; raw keys never leave the scan.
    */
  def hllRegistersFromHashes(dh: DataFrame, p: Int): DataFrame = {
    val wbits = 64 - p
    dh.select(col("g"), shiftrightunsigned(col("h"), wbits).as("bucket"),
        col("h").bitwiseAND(lit((1L << wbits) - 1)).as("w"))
      .groupBy("g", "bucket")
      .agg(max(when(col("w") === 0, lit(wbits + 1))
        .otherwise(lit(wbits + 1) - length(bin(col("w"))))).as("reg"))
  }

  /** Raw HLL readout from a register frame: the harmonic sum
    * Σ 2^-reg is captured EXACTLY as an integer sum of 2^(wbits+1-reg)
    * scaled by 2^(wbits+1) — every term a power of two in
    * DECIMAL(38,0), order-invariant under any partitioning (a double
    * accumulation would be partition-order-sensitive: the terms span
    * more than 53 bits). The estimate α_m·m²/Σ is then one fixed
    * association of correctly-rounded double ops. Returns (g, v_zero,
    * reg_sum — CAST of the exact scaled sum —, est_hll). Bias
    * corrections (linear counting, HLL++) need ln/empirical tables
    * that are not bit-replayable cross-engine; the raw estimator is
    * the oracle-checkable core, accurate to ~1.04/√m in the mid range.
    */
  def hllEstimate(regs: DataFrame, p: Int = 9): DataFrame = {
    val wbits = 64 - p
    val m = 1L << p
    val scale = 1L << (wbits + 1) // 2^(wbits+1) — exact as long and double
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val st = regs.groupBy("g").agg(
      count(lit(1)).as("n_regs"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${wbits + 1} - reg)")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("sp"))
    st.select(col("g"), (lit(m) - col("n_regs")).as("v_zero"),
        (col("sp") + (lit(m) - col("n_regs"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)) * lit(scale))
          .as("s"))
      .select(col("g"), col("v_zero"), col("s").cast("double").as("reg_sum"),
        ((((alpha * lit(m.toDouble)) * lit(m.toDouble)) * lit(scale.toDouble)) /
          col("s").cast("double")).as("est_hll"))
  }

  /** Per-group HLL distinct estimate with the exact count as the
    * quality row: (g, v_zero, reg_sum, n_exact, est_hll).
    */
  def hllDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  p: Int = 9): DataFrame = {
    val dh = df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("g"), Dedup.md5Hash64(col(keyCol)).as("h"))
      .distinct()
      .transform(graft.ops.Pin.pin) // feeds both the registers and n_exact
    val est = hllEstimate(hllRegistersFromHashes(dh, p), p)
    val exact = dh.groupBy("g").agg(count(lit(1)).as("n_exact"))
    est.join(exact, "g")
      .select(col("g"), col("v_zero"), col("reg_sum"), col("n_exact"),
        col("est_hll"))
  }

  /** Per-group approximate quantiles from a bottom-k-by-hash sample
    * (bottom-k sketches: Cohen & Kaplan, PODC 2007). The k rows with
    * the smallest salted md5 hashes form a uniform without-replacement
    * sample of the group — deterministic, replayable, and mergeable
    * exactly like KMV (bottom-k of a union = bottom-k of the shard
    * bottom-ks), so per-shard samples roll up without rescans. Sample
    * quantiles converge at ~√(q(1-q)/k) rank error.
    *
    * This is the 100 TB shape for percentile profiling: exact per-group
    * quantiles need a full sort (or a single-task funnel per group);
    * this is one two-stage top-k plus an O(k) in-memory array per
    * group. The readout picks ELEMENTS (lower quantile, index
    * floor(q·(n-1))) — never interpolates — so outputs are input
    * values, exact in any engine.
    *
    * Output: (g, n_sample, q_<label> per requested quantile).
    */
  def bottomKSampleQuantiles(df: DataFrame, groupCol: String,
                             valueCol: String, idCol: String,
                             k: Int = 512,
                             qs: Seq[(String, Double)] =
                               Seq("q25" -> 0.25, "q50" -> 0.5,
                                   "q75" -> 0.75, "q90" -> 0.9),
                             salt: String = "#qs"): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(valueCol).as("v"),
      col(idCol).as("id"),
      Dedup.md5Hash64(concat(col(idCol).cast("string"), lit(salt))).as("h"))
    val smp = TopK.topKPerKey(base, Seq("g"), Seq(col("h"), col("id")), k, "rn")
    val agg = smp.groupBy("g").agg(
      array_sort(collect_list(col("v"))).as("vs"), count(lit(1)).as("n"))
    val sels = qs.map { case (label, q) =>
      element_at(col("vs"),
        floor(lit(q) * (col("n") - 1)).cast("int") + 1).as(label)
    }
    agg.select(col("g") +: col("n").as("n_sample") +: sels: _*)
  }

  /** The CMS counter table as a driver-side array (row-major,
    * depth × width longs — bounded by the sketch dimensions, never by
    * input size), for shipping into scan-side expressions as a broadcast
    * frequency dictionary.
    */
  def cmsCellsArray(df: DataFrame, keyCol: String, depth: Int = 4,
                    width: Int = 1024,
                    weightCol: Option[String] = None): Array[Long] = {
    // With a weight column the input is a pre-aggregated (key, count)
    // frame: the key is hashed ONCE per distinct value instead of once
    // per occurrence — same cells, a vocabulary-sized amount of hashing.
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    val cells = df.filter(col(keyCol).isNotNull)
      .select(w.as("w"), posexplode(array((0 until depth).map(i =>
        pmod(Dedup.md5Hash64(concat(col(keyCol), lit(s"#cms$i"))),
          lit(width.toLong))): _*)).as(Seq("r", "b")))
      .groupBy("r", "b").agg(sum(col("w")).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    Array.tabulate(depth * width) { i =>
      cells.getOrElse((i / width, (i % width).toLong), 0L)
    }
  }

  /** Scan-side CMS frequency estimate of `key` from a cells array:
    * min over depth rows of the probed counter (biased up, never down).
    * Pure expression — usable inside higher-order functions over token
    * arrays, so per-document frequency features never join or shuffle.
    */
  def cmsEstimate(key: Column, cells: Array[Long], depth: Int = 4,
                  width: Int = 1024): Column =
    (0 until depth).map { i =>
      val b = pmod(Dedup.md5Hash64(concat(key, lit(s"#cms$i"))), lit(width.toLong))
      element_at(lit(cells), (lit(i.toLong * width) + b).cast("int") + 1)
    }.reduce(least(_, _))

  /** Count-min sketch frequency estimates for `probes` against the
    * key stream: depth hash rows × width counters, estimate = min over
    * rows of the probed counter (biased up, never down).
    *
    * The sketch is ONE groupBy over (row, bucket) int pairs — the
    * classic shape: the counter table is depth × width cells no matter
    * how many input rows, every cell a map-side-combined sum, and the
    * probe lookup is a broadcast join of the probe keys' cells. Row
    * hashes are salted [[Dedup.md5Hash64]] (`key + "#cms<i>"`), buckets
    * `pmod(h, width)` — deterministic and oracle-replayable.
    *
    * Output: (probe key, est — the count-min estimate, n_exact).
    */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, probes: DataFrame,
                      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2)
    def buckets(key: org.apache.spark.sql.Column) = array((0 until depth).map(i =>
      pmod(Dedup.md5Hash64(concat(key, lit(s"#cms$i"))), lit(width.toLong))): _*)
    // ONE scan: each key contributes its depth cells, collapsed map-side.
    val cells = df.filter(col(keyCol).isNotNull)
      .select(posexplode(buckets(col(keyCol))).as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
    val probeCells = probes
      .select(col(keyCol).as("key"), posexplode(buckets(col(keyCol))).as(Seq("r", "b")))
    // The counter table is depth*width rows however big the input — it
    // broadcasts; a cell no input key hashed into reads as 0.
    val est = probeCells.join(broadcast(cells), Seq("r", "b"), "left")
      .groupBy("key").agg(min(coalesce(col("c"), lit(0L))).as("est"))
    val exact = df.select(col(keyCol).as("key"))
      .join(broadcast(probes.select(col(keyCol).as("key"))), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("key"), "left")
      .select(col("key").as(keyCol), col("est"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
  }
}
