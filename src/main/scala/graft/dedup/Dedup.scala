package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication for large-scale corpus curation: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. Designed for the 100 TB shape:
  *  - exact dedup shuffles only 16-byte fingerprints, never text;
  *  - MinHash/SimHash candidate generation is a band-bucket equi-join
  *    (shuffle on small band keys), with exact verification only on the
  *    candidate pairs — no quadratic comparison anywhere;
  *  - all hash seeds are fixed, so results are deterministic under any
  *    partitioning.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** One row per duplicate-group: canonical (min) id, group size. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Keep exactly one row (min id) per canonical text.
    *
    * Round 20 (guide §2.3 — shuffle keys, not payloads): the
    * row_number window over fingerprint(text) shuffled FULL ROWS —
    * text included — to elect a winner the 16-byte fingerprint and the
    * id already determine. Now: a map-side-combined min(id) per
    * fingerprint (the [[exactGroups]] aggregate, ids+fps only cross
    * the exchange), then an AQE-sized semi-join pulls the winners'
    * full rows. Identical keep rule (rn=1 under orderBy id ⟺ min id —
    * ids are unique), identical output columns.
    */
  def dropExactDups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(exactGroups(df, idCol, textCol)
        .select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** Per-duplicate-group keep decision by QUALITY, not id — the keep
    * policy a curated training set actually wants (min-id keeps are
    * arbitrary; near-identical pages differ in boilerplate, casing, and
    * junk, and the cleanest copy should survive). One row per group:
    * (fp, keep_id, n_docs, best_score), keep = argmax score with ties
    * to the smaller id (total, replayable order). Shape: fingerprints +
    * (id, score) aggregate with map-side combine — text never crosses
    * the shuffle. Requires a numeric `idCol`.
    */
  def keepBestGroups(df: DataFrame, idCol: String, textCol: String,
                     scoreCol: String): DataFrame =
    df.select(TextOps.fingerprint(col(textCol)).as("fp"),
        col(idCol).as("__id"), col(scoreCol).as("__s"))
      .groupBy("fp")
      .agg(
        max_by(col("__id"), struct(col("__s"), (-col("__id")).as("n"))).as("keep_id"),
        count(lit(1)).as("n_docs"),
        max(col("__s")).as("best_score"))

  /** The kept rows themselves: full input rows whose id won its group in
    * [[keepBestGroups]] — a broadcast-or-shuffle semi-join on ids only.
    */
  def keepBest(df: DataFrame, idCol: String, textCol: String,
               scoreCol: String): DataFrame =
    df.join(keepBestGroups(df, idCol, textCol, scoreCol)
      .select(col("keep_id").as(idCol)), Seq(idCol), "left_semi")

  // -------------------------------------------------------------- minhash


  /** Word n-gram shingles of the canonical text (distinct strings).
    * Readable form — for the hot minhash/Jaccard path use
    * [[shingleHashes]], which avoids per-index slice+concat allocation.
    */
  def shingles(text: Column, n: Int): Column =
    // n-fold zip_with over shifted slices, not slice(toks, i, n) in an
    // index lambda: a non-lambda subexpression in a HOF body
    // re-evaluates per ELEMENT, so the old form re-ran the tokenizing
    // split O(tokens) times per doc (the q195 lesson,
    // LangModel.bigramArr) — quadratic on the streaming
    // minhashSignatureExpr path that folds over this array numHashes
    // times. The token array is additionally let-bound once per row
    // through a single-element array + transform (the
    // [[graft.text.TextOps.chunkWindows]] trick): the gram tree
    // references it 2n+2 times, and each textual reference of a raw
    // expression analyzes into a distinct lambda binding that
    // subexpression elimination cannot unify — the unbound form re-ran
    // the split 2n+2 times per ROW.
    array_distinct(flatten(transform(array(TextOps.tokens(text)), toks => {
      val grams = (2 to n)
        .map(k => slice(toks, lit(k), size(toks) - (n - 1)))
        .foldLeft(slice(toks, lit(1), size(toks) - (n - 1)))(
          (acc, s) => zip_with(acc, s, (a, b) => concat_ws(" ", a, b)))
      when(size(toks) >= n, grams)
        .otherwise(array(concat_ws(" ", toks)))
    })))

  /** Distinct (id, shingle-string) ROWS — same shingle set as
    * [[shingles]] (distinct n-gram strings; whole trimmed text when the
    * doc has fewer than n tokens; "" for null text) but built with
    * codegen'd operators instead of the per-element interpreted
    * `transform` lambda, which dominates the cost of every shingle scan
    * (~4-6× slower at corpus scale). Tokens are exploded once and each
    * shingle is a `concat_ws` over `lead` windows partitioned by doc —
    * one hash shuffle on the doc id (even distribution at any scale),
    * then a distinct.
    */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleRowsRaw(df, idCol, textCol, n).distinct()

  /** [[shingleRows]] WITHOUT the final distinct — one (id, shingle) row
    * per token POSITION, so a shingle occurring k times in a doc appears
    * k times. Correct (and one full-stream exchange cheaper) for any
    * consumer invariant under per-doc shingle multiplicity — the MinHash
    * signature paths: min(h⊕c) over the multiset equals min over the
    * distinct set (round-20 measurement: the distinct was ~25% of the
    * q79 signature pipeline). Set-semantics consumers (Jaccard counts)
    * keep using [[shingleRows]].
    */
  private[graft] def shingleRowsRaw(df: DataFrame, idCol: String,
                                    textCol: String, n: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      TextOps.tokens(coalesce(col(textCol), lit(""))).as("t"))
    val short = toks.filter(size(col("t")) < n)
      .select(col("id"), concat_ws(" ", col("t")).as("s"))
    val pos = toks.filter(size(col("t")) >= n)
      .select(col("id"), size(col("t")).as("len"),
        posexplode(col("t")).as(Seq("p", "tok")))
    val w = Window.partitionBy("id").orderBy("p")
    val parts = col("tok") +: (1 until n).map(k => lead(col("tok"), k).over(w))
    val full = pos
      .withColumn("s", concat_ws(" ", parts: _*))
      .filter(col("p") <= col("len") - n)
      .select("id", "s")
    full.union(short)
  }

  /** Distinct 64-bit identities of word n-gram shingles: tokens are
    * xxhash64'd once, then n consecutive hashes combine by xor of
    * position-rotated copies (`zip_with` pads the short side with null,
    * which propagates and marks the ragged tail for the filter; bitwise
    * ops are exempt from ANSI overflow checks). Same set semantics as
    * [[shingles]] up to hash collisions (~2^-64 per pair); ~n array ops
    * per document instead of ~len slices.
    */
  def shingleHashes(text: Column, n: Int): Column = {
    def rotl(c: Column, k: Int): Column =
      shiftleft(c, k).bitwiseOR(shiftrightunsigned(c, 64 - k))
    // Both the token array and its per-token hash array are let-bound
    // once per row through the single-element-array + transform trick
    // (the [[graft.text.TextOps.chunkWindows]] pattern): the xor fold
    // references the hash array ~2n times and the short-doc fallback
    // re-reads the tokens, and each textual reference of a raw
    // expression analyzes into a distinct lambda binding that
    // subexpression elimination cannot unify — the unbound form re-ran
    // the tokenizing split ~2n times per ROW (the q195 lesson's
    // per-ROW sibling; see SCALE.md round 13).
    array_distinct(flatten(transform(array(TextOps.tokens(text)), toks =>
      flatten(transform(array(transform(toks, t => xxhash64(t))), th => {
        val combined = (1 until n).foldLeft(th) { (acc, k) =>
          zip_with(acc, slice(th, lit(k + 1), greatest(size(th) - k, lit(0))),
            (a, b) => a.bitwiseXOR(rotl(b, (7 * k) % 63 + 1)))
        }
        when(size(th) >= n, filter(combined, c => c.isNotNull))
          .otherwise(array(xxhash64(concat_ws(" ", toks))))
      })))))
  }

  /** Seeded per-family xor constants (md5-derived, driver-side) for the
    * production MinHash family: family i maps a 64-bit shingle hash h to
    * h XOR c_i — a bijective permutation of the full hash space, the
    * same construction as the md5 oracle family ([[minhashTableMd5]]).
    *
    * This REPLACED the original affine family `(a·h + b) mod (2^61−1)`
    * in round 9: with h folded to 31 bits, a·h + b < 2^62 wraps the
    * 2^61−1 modulus at most once — and for a < 2^30 (half the seeds)
    * NEVER — so those "permutations" were monotone in h and every
    * component picked the same global min-shingle. Signature components
    * were massively correlated: measured est-sim on J≈0.88/0.83 pairs
    * came out 1.0/0.125 instead of ≈J, wrecking the LSH S-curve (recall
    * of true near-dups that differ in the min shingle, false banding
    * collisions for docs sharing it). A modular-affine family is only
    * sound when the modulus sits just above the hash range (e.g.
    * 2^31−1 over 31-bit h); the xor family avoids the pitfall entirely
    * and keeps every min replayable by any engine with xor.
    */
  private def xorConsts(numHashes: Int, seed: Long): IndexedSeq[Long] =
    (0 until numHashes).map(i => md5Const64(s"graft-minhash-xx/$seed#$i"))

  /** (idCol, sig: array<long> of length numHashes) — the MinHash signature
    * of each document's shingle set. Seeded xor permutations of the
    * 64-bit xxhash64 shingle hash (see [[xorConsts]]); one explode + one
    * groupBy (shuffles only (id, 8-byte hash) pairs, map-side combined).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, shingleSize: Int = 3,
                        seed: Long = 42L): DataFrame = {
    val consts = xorConsts(numHashes, seed)
    val exploded = shingleRows(df, idCol, textCol, shingleSize)
      .select(col("id").as(idCol), xxhash64(col("s")).as("h"))
    val aggs = consts.zipWithIndex.map { case (c, i) =>
      min(col("h").bitwiseXOR(lit(c))).as(s"s$i")
    }
    exploded.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"s$i")): _*).as("sig"))
  }

  /** The [[minhashSignatures]] signature as ONE pure column expression —
    * no explode, no shuffle: shingle strings → 64-bit hashes → one
    * `array_min` per xor family. Value-identical to the aggregated form
    * (same shingle set, same [[xorConsts]]), proven by spec. This is
    * the streaming-safe shape: a projection runs in any micro-batch with
    * no stateful aggregation, so online dedup can attach signatures at
    * ingestion. Cost is numHashes passes over the doc's shingle array
    * inside one projection — the batch path amortizes that via
    * explode+groupBy; per-doc columnar work is the right trade wherever
    * a shuffle is unavailable (streams) or unwanted (scan-side tagging).
    *
    * The shingle-hash array is LET-BOUND once per row
    * ([[graft.text.TextOps.letBound]]): the per-family min maps
    * reference it numHashes times, and each textual reference of the
    * raw expression analyzes into a distinct lambda binding CSE cannot
    * unify — the unbound form re-built the whole shingle array (the
    * tokenizing split, the n-fold zip_with, the distinct) numHashes
    * times per row, a 64× hidden multiplier on exactly the streaming
    * path that cannot amortize via explode (SCALE.md round 13).
    */
  def minhashSignatureExpr(text: Column, numHashes: Int = 64,
                           shingleSize: Int = 3, seed: Long = 42L): Column = {
    val consts = xorConsts(numHashes, seed)
    TextOps.letBound(transform(shingles(coalesce(text, lit("")), shingleSize),
      s => xxhash64(s))) { hs =>
      array(consts.map { c =>
        array_min(transform(hs, h => h.bitwiseXOR(lit(c))))
      }: _*)
    }
  }

  /** Candidate near-duplicate pairs via LSH banding: split the signature
    * into `bands` bands of numHashes/bands rows; docs sharing any band
    * hash become a candidate pair. Returns (id_a, id_b) with a < b,
    * distinct.
    *
    * `maxBucketSize` caps the per-(band,hash) membership before the
    * self-join: a degenerate hot bucket (boilerplate shingles, empty
    * docs) otherwise goes quadratic WITHIN the bucket at corpus scale.
    * Docs beyond the cap in a bucket lose only that bucket's votes —
    * with multiple bands true near-dups still collide elsewhere
    * (standard LSH practice; set to Int.MaxValue to disable).
    */
  def minhashCandidates(sigs: DataFrame, idCol: String, bands: Int,
                        numHashes: Int = 64,
                        maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val banded = sigs.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(concat_ws(",", slice(col("sig"), b * r + 1, lit(r))), b))))
      .toDF(idCol, "band", "bh")
    val capped = capBuckets(banded, idCol, Seq("band", "bh"), maxBucketSize)
      .transform(graft.ops.Pin.pin) // ids x bands rows; both self-join sides reuse it
    val left = capped.select(col(idCol).as("id_a"), col("band"), col("bh"))
    val right = capped.select(col(idCol).as("id_b"), col("band"), col("bh"))
    left.join(right, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Keep at most `cap` members per bucket (deterministic: the `cap`
    * smallest ids). One hash-partitioned window — no global ordering.
    */
  private def capBuckets(df: DataFrame, idCol: String, bucketCols: Seq[String],
                         cap: Int): DataFrame =
    if (cap == Int.MaxValue) df
    else df
      .withColumn("__bn", row_number().over(
        Window.partitionBy(bucketCols.map(col): _*).orderBy(col(idCol))))
      .filter(col("__bn") <= cap).drop("__bn")

  /** Exact Jaccard over word n-gram shingle sets (64-bit identities) for
    * given pairs.
    */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, shingleSize: Int = 3): DataFrame = {
    // Shingle only the docs that appear in a candidate pair, and pin the
    // result: the unrestricted form re-shingled the WHOLE corpus once per
    // join side, while the verify cost should be bounded by the candidate
    // set (same shape as minhashNearDupsMd5's semi-join).
    val p = graft.ops.Pin.pin(pairs) // bounded pair list, referenced 3×
    val candIds = p
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
    val sh = docs.join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol), shingleHashes(col(textCol), shingleSize).as("sh"))
      .transform(graft.ops.Pin.pin)
    p
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select("id_a", "id_b", "jaccard")
  }

  /** Cross-engine reproducible 64-bit hash: the first 8 md5 digest bytes
    * as a signed long (two's complement). Any engine with md5 can
    * replicate it bit-for-bit (the DuckDB oracle assembles the same value
    * via HUGEINT arithmetic); xxhash64 is Spark-only. Slower than
    * xxhash64 — use for oracle-checked paths, keep xxhash64 in production
    * hot paths. Since round 8 this is the native codegen'd
    * [[graft.functions.Md5Hash64]] (digest bytes straight to long, no
    * hex-string round-trip); [[md5Hash64Ref]] keeps the declarative
    * composition as the portable reference, pinned equal by DedupSpec.
    */
  def md5Hash64(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.Md5Hash64(
        org.apache.spark.sql.graft.Bridge.expression(c.cast("binary"))))

  /** Declarative reference form of [[md5Hash64]]: first 16 hex chars of
    * md5 assembled via conv + shiftleft (shiftleft wraps, which bitwise
    * ops are allowed to do under ANSI) — same values bit-for-bit.
    */
  def md5Hash64Ref(c: Column): Column = {
    val hex = md5(c.cast("binary"))
    val hi = conv(substring(hex, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(hex, 9, 8), 16, 10).cast("long")
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** Exact n-gram Jaccard similarity join: all pairs with
    * jaccard >= threshold, computed from distinct (id, shingle-md5) rows
    * via a shingle equi-join — never an all-pairs comparison. This is the
    * oracle-checkable exact baseline; the scale path for fuzzier
    * thresholds is [[minhashNearDups]] (banded LSH bounds the candidate
    * set; here a boilerplate shingle shared by m docs contributes m²/2
    * join rows).
    *
    * jaccard = |A∩B| / (|A|+|B|-|A∩B|) over DISTINCT shingles; the single
    * integer-ratio double division is IEEE-identical across engines.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = shingleRows(df, idCol, textCol, shingleSize)
      .select(col("id"), unhex(md5(col("s").cast("binary"))).as("shh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("nsh"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.shh") === col("b.shh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("nsh").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("nsh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
  }

  /** Asymmetric CONTAINMENT join — the dup relation symmetric Jaccard
    * structurally misses: a short document swallowed whole by a longer
    * one (a quoted article inside a commentary page, an abstract inside
    * its paper) has jaccard ≈ |small|/|large| — arbitrarily low — while
    * containment = n_common / min(n_a, n_b) is 1.0. The standard metric
    * for "one side is (nearly) a subset of the other" (Broder's
    * containment, the relation behind news-wire dedup).
    *
    * Same shingle equi-join machinery as [[jaccardPairs]] (reused at
    * threshold 0 — containment > 0 already requires a shared shingle, so
    * the candidate set is identical); only the final metric differs.
    * Output adds `containment`; pairs keep the id_a < id_b convention —
    * direction recovers from the sizes (the smaller set is the contained
    * one).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int = 3,
                       threshold: Double = 0.8): DataFrame =
    jaccardPairs(df, idCol, textCol, shingleSize, threshold = 0.0)
      .withColumn("containment",
        col("n_common").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "containment")

  /** EXACT Jaccard similarity join at scale: same output contract as
    * [[jaccardPairs]] (all pairs with n-gram-set jaccard >= threshold),
    * but candidate generation uses PREFIX FILTERING (the AllPairs family,
    * Bayardo et al., WWW 2007) instead of the full shingle equi-join.
    *
    * Why: in the plain equi-join a boilerplate shingle shared by m docs
    * contributes m²/2 join rows — the hot-key quadratic blow-up that kills
    * the exact join at corpus scale. Prefix filtering orders every doc's
    * shingles by GLOBAL frequency ascending (rarest first; ties broken by
    * the 64-bit hash — one total order shared by all docs) and joins only
    * each doc's first `|d| - ceil(t*|d|) + 1` shingles: if two sets have
    * jaccard >= t, their prefixes under any common total order must share
    * at least one element (pigeonhole on the required overlap
    * `|A∩B| >= t/(1+t)*(|A|+|B|) >= t*max(|A|,|B|)`), so no qualifying
    * pair is missed — while the boilerplate shingles, being the most
    * frequent, sort to the SUFFIX and never generate candidates. A
    * length filter (`min(nsh) >= t*max(nsh)`, necessary for jaccard >= t)
    * prunes inside the join; exact verification then runs only on the
    * surviving candidate pairs.
    *
    * Scale shape: one groupBy for frequencies (map-side combined), one
    * doc-partitioned window for ranks, an equi-join on PREFIX rows only
    * (shuffle keyed by the 64-bit hash — never text), and a
    * candidate-bounded verify join. Intermediates referenced twice are
    * pinned. This is the scale path that upgrades [[jaccardPairs]] (kept
    * as the labeled quadratic oracle baseline, reference `Dedup.ipynb`
    * n-gram Jaccard semantics).
    */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                         shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val docSets = canonicalDocSets(df, idCol, textCol, shingleSize)
    // Prefix length p = |d| - ceil(t*|d|) + 1 (AllPairs, jaccard form);
    // rk is the 1-based rank of the shingle in the canonical order.
    val prefix = docSets.select(col("id"), col("nsh"),
        posexplode(slice(col("shs"), lit(1),
          (col("nsh") - ceil(lit(threshold) * col("nsh")) + lit(1)).cast("int"))))
      .select(col("id"), col("nsh"), (col("pos") + 1).as("rk"), col("col").as("shh"))
    // Candidates: equi-join on prefix shingles, with the length filter
    // (jaccard >= t forces min|d| >= t*max|d|) and PPJoin's positional
    // filter — the overlap can't exceed 1 + min remaining suffix length
    // at the matched rank, so rows whose upper bound misses the required
    // overlap t/(1+t)*(|A|+|B|) drop before the distinct. (Per-row
    // filtering is safe: for a qualifying pair the FIRST common shingle
    // sits in both prefixes and its bound holds.) Algebra kept
    // multiplicative to avoid a double-rounding ceil at the boundary.
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shh") === col("b.shh") && col("a.id") < col("b.id") &&
          least(col("a.nsh"), col("b.nsh")) >=
            lit(threshold) * greatest(col("a.nsh"), col("b.nsh")) &&
          (lit(1) + least(col("a.nsh") - col("a.rk"), col("b.nsh") - col("b.rk"))) *
            lit(1.0 + threshold) >=
            lit(threshold) * (col("a.nsh") + col("b.nsh")) - lit(1e-9))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // Exact verification: one hash join per side against the |docs|-row
    // set frame, intersection in codegen.
    val ca = docSets.select(col("id").as("id_a"), col("shs").as("shs_a"),
      col("nsh").as("n_a"))
    val cb = docSets.select(col("id").as("id_b"), col("shs").as("shs_b"),
      col("nsh").as("n_b"))
    cand.join(ca, "id_a").join(cb, "id_b")
      .withColumn("n_common", size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
  }

  /** Pinned canonical doc-set frame shared by the prefix-filtered
    * similarity joins ([[prefixJaccardPairs]], [[prefixContainmentPairs]]):
    * one row per doc — (id, shs: 64-bit shingle identities sorted by
    * (global document frequency, hash) — the shared canonical order
    * rarest-first, nsh = |set|).
    *
    * Shingle sets are 64-bit identities from the [[shingleHashes]] scan
    * projection (the [[verifyJaccard]] identity space — no per-token
    * window, no text in flight). One explode feeds the global document
    * frequency via a count window over the hash (one shuffle gives df
    * per ROW — the groupBy+re-join form costs a second full-stream
    * shuffle; same trick as the dup-span gram counting), then the stream
    * collapses back to ONE ROW PER DOC. From here on nothing is
    * per-shingle except the prefix stream: the doc frame is |docs| rows,
    * and exact verification is an in-codegen array_intersect against it
    * (LONG elements keep Spark's hash-set fast path; binary/struct
    * elements fall back to a nested-loop compare), not a re-join of the
    * full shingle stream.
    */
  private def canonicalDocSets(df: DataFrame, idCol: String, textCol: String,
                               shingleSize: Int): DataFrame = {
    val ex = df.select(col(idCol).as("id"),
      explode(shingleHashes(coalesce(col(textCol), lit("")), shingleSize)).as("h"))
    graft.ops.Pin.pin(
      ex.withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
        .groupBy("id")
        .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ss"))
        .select(col("id"), expr("transform(ss, x -> x.h)").as("shs"),
          size(col("ss")).cast("long").as("nsh")))
  }

  /** EXACT containment join at scale: same output contract as
    * [[containmentPairs]] (all pairs with n_common / min(n_a, n_b) >=
    * threshold), but candidate generation uses the ASYMMETRIC prefix
    * filter instead of the full shingle equi-join.
    *
    * Why [[containmentPairs]] cannot reuse the jaccard prefix bound: its
    * required overlap t·min(|A|,|B|) depends on the PARTNER's size, so a
    * big doc's own prefix would have to assume the smallest possible
    * partner (length 1) — i.e. the whole doc. The standard asymmetric
    * reduction (the PPJoin family's containment/overlap variant): only
    * the pair's SMALLER side needs a prefix. For a pair with
    * m = min(|A|,|B|), overlap o >= t·m and o integer force
    * o >= ceil(t·m); if none of the smaller doc's first
    * m - ceil(t·m) + 1 canonical-order shingles appeared in the larger
    * doc, o <= ceil(t·m) - 1 < t·m — contradiction. So joining
    * small-side PREFIX rows against the FULL ranked stream (ordered by
    * (nsh, id) so each unordered pair has exactly one small side)
    * misses no qualifying pair, while a boilerplate shingle shared by
    * m docs contributes (its prefix count)·m join rows instead of m²/2
    * — and frequent shingles, sorting to the suffix, rarely enter any
    * prefix. The per-row positional filter is PPJoin's: at the pair's
    * FIRST common canonical shingle (ranks rk_a, rk_b — common elements
    * appear in the same relative order on both sides), o <= 1 +
    * min(nsh_a - rk_a, nsh_b - rk_b), so rows whose upper bound misses
    * t·min drop before the distinct; the first-common-shingle row of a
    * qualifying pair always survives. Algebra kept multiplicative with
    * a 1e-9 slack on the double threshold product (ceil over a binary
    * double like 0.8·5 = 4.000000000000000222 would otherwise SHRINK a
    * boundary prefix and lose pairs).
    *
    * Scale shape: one [[canonicalDocSets]] build (one full-stream
    * shuffle + one per-doc aggregate), a prefix×full equi-join on
    * 64-bit hashes — never text — and a candidate-bounded
    * array_intersect verify against the |docs|-row set frame. This is
    * the scale path that upgrades [[containmentPairs]] (kept as the
    * labeled quadratic oracle baseline) exactly as
    * [[prefixJaccardPairs]] upgraded [[jaccardPairs]].
    */
  def prefixContainmentPairs(df: DataFrame, idCol: String, textCol: String,
                             shingleSize: Int = 3,
                             threshold: Double = 0.8): DataFrame = {
    val docSets = canonicalDocSets(df, idCol, textCol, shingleSize)
    // full ranked stream: every (doc, shingle) with its 1-based rank in
    // the canonical order — re-exploded per join side from the PINNED
    // docSets frame (cheap projection, no extra pin job)
    def ranked = docSets.select(col("id"), col("nsh"), posexplode(col("shs")))
      .select(col("id"), col("nsh"), (col("pos") + 1).as("rk"),
        col("col").as("shh"))
    // small-side prefix: m - ceil(t·m) + 1 rarest shingles
    val prefix = ranked.filter(col("rk") <=
      col("nsh") - ceil(lit(threshold) * col("nsh") - lit(1e-9)) + lit(1))
    val cand = prefix.as("a")
      .join(ranked.as("b"),
        col("a.shh") === col("b.shh") &&
          // a is the pair's unique smaller side ((nsh, id) total order)
          struct(col("a.nsh"), col("a.id")) < struct(col("b.nsh"), col("b.id")) &&
          (lit(1) + least(col("a.nsh") - col("a.rk"), col("b.nsh") - col("b.rk")))
            >= lit(threshold) * col("a.nsh") - lit(1e-9))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    val ca = docSets.select(col("id").as("id_a"), col("shs").as("shs_a"),
      col("nsh").as("n_a"))
    val cb = docSets.select(col("id").as("id_b"), col("shs").as("shs_b"),
      col("nsh").as("n_b"))
    cand.join(ca, "id_a").join(cb, "id_b")
      .withColumn("n_common",
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("containment",
        col("n_common").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "containment")
  }

  /** Oracle-checkable MinHash signatures in long form (id, h_idx, minhash):
    * each shingle is md5-hashed ONCE ([[md5Hash64]]) and hash family i is
    * `h XOR c_i`, where constant c_i is itself the md5-derived hash of
    * `"graft-minhash#" + i` — a bijective per-family permutation with no
    * modular arithmetic, so any engine with md5 and xor replicates every
    * min bit-for-bit (the production near-dup path keeps the faster
    * xxhash64 family in [[minhashSignatures]]). Docs with no shingle rows
    * (null text) keep their nHashes rows with null minhash via the final
    * left join.
    *
    * Scale shape: one md5 per shingle; the × nHashes blow-up is a cheap
    * xor that collapses map-side (the groupBy's partial min leaves
    * ≤ nHashes rows per id per partition before the shuffle), so shuffle
    * volume is bounded by ids × nHashes, never by shingle count.
    */
  def minhashTableMd5(df: DataFrame, idCol: String, textCol: String,
                      nHashes: Int = 16, shingleSize: Int = 3): DataFrame = {
    val sig = minhashSigArrayMd5(df, idCol, textCol, nHashes, shingleSize)
      .select(col("id"), posexplode(col("sig")).as(Seq("h_idx", "minhash")))
      .withColumn("h_idx", col("h_idx").cast("long"))
    val idx = broadcast(df.sparkSession.range(nHashes).toDF("h_idx"))
    df.select(col(idCol).as("id")).crossJoin(idx)
      .join(sig, Seq("id", "h_idx"), "left")
      .select(col("id").as(idCol), col("h_idx"), col("minhash"))
  }

  /** (id, sig: array<long> of length nHashes) — the md5-family MinHash
    * signature of every non-null-text doc, as ONE groupBy(id) with
    * nHashes `min` aggregates over the NON-DISTINCT shingle stream
    * ([[shingleRowsRaw]] — min is multiplicity-invariant). Value-wise
    * sig[i] = the long-form minhash at h_idx i ([[minhashTableMd5]]
    * posexplodes exactly this array, so the two forms cannot drift).
    *
    * Plan shape vs the round-19 long form (q79 plan audit, round 20):
    * the (id, shingle) distinct exchange is GONE, the ×nHashes
    * posexplode row blowup is GONE (each row computes the nHashes xors
    * in one projection), and the remaining exchange after the
    * shingle window carries ≤|ids| partially-aggregated rows instead of
    * |ids|×nHashes — 3 full-stream exchanges down to 1 (+1 bounded).
    */
  private[graft] def minhashSigArrayMd5(df: DataFrame, idCol: String,
                                        textCol: String, nHashes: Int,
                                        shingleSize: Int): DataFrame = {
    val consts = Array.tabulate(nHashes)(i => md5Const64(s"graft-minhash#$i"))
    val sh = shingleRowsRaw(df.where(col(textCol).isNotNull), idCol, textCol,
        shingleSize)
      .select(col("id"), md5Hash64(col("s")).as("h"))
    val aggs = consts.zipWithIndex.map { case (c, i) =>
      min(col("h").bitwiseXOR(lit(c))).as(s"__m$i")
    }
    sh.groupBy("id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until nHashes).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** Driver-side twin of [[md5Hash64]] for literal constants: first 16 hex
    * chars of the UTF-8 md5, as a signed (two's-complement) long.
    */
  def md5Const64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** Oracle-checkable banded-LSH near-dup detection end to end: md5-family
    * signatures ([[minhashTableMd5]]) → per-band keys (the band's
    * minhashes in h_idx order, string-joined) → distinct candidate pairs
    * sharing any band → exact n-gram Jaccard computed ONLY over candidate
    * ids' shingle sets, kept at `threshold`. Deterministic at every step,
    * so DuckDB replicates the full pipeline (q80) — the production path
    * with the same DAG shape but engine-native hashing is
    * [[minhashNearDups]].
    *
    * Scale shape: the banded self-join carries (id, band, key) rows only;
    * verification semi-joins the shingle stream down to candidate ids
    * before the shingle equi-join, so verify cost is bounded by the
    * candidate set, never the corpus.
    */
  def minhashNearDupsMd5(df: DataFrame, idCol: String, textCol: String,
                         nHashes: Int = 16, bands: Int = 4,
                         shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(nHashes % bands == 0, "nHashes must divide into bands")
    val r = nHashes / bands
    // Band keys derive PER ROW from the signature array (round 20): the
    // long form's ×nHashes explode + groupBy(id, band) + collect_list
    // re-assembly rebuilt by aggregation what [[minhashSigArrayMd5]]
    // already holds in h_idx order — each band key is a concat_ws over
    // an array slice, zero extra exchanges. Key strings are identical
    // (minhashes in h_idx order, comma-joined); null-text docs are
    // already absent from the array form, which is what the long form's
    // isNotNull filter re-established.
    //
    // The band table is referenced on both sides of the self-join and the
    // candidate table three times downstream; Spark replans (not reuses)
    // each reference, re-running the whole signature pipeline per copy.
    // Both are BOUNDED intermediates (ids x bands rows / candidate pairs),
    // so pin them (ops.Pin: localCheckpoint in local mode, reliable
    // checkpoint on a cluster): compute once, reuse everywhere.
    val sigs = minhashSigArrayMd5(df, idCol, textCol, nHashes, shingleSize)
    val banded = sigs
      .select(col("id"),
        posexplode(array((0 until bands).map { b =>
          concat_ws(",", (b * r until (b + 1) * r)
            .map(i => element_at(col("sig"), i + 1).cast("string")): _*)
        }: _*)).as(Seq("band", "key")))
      .select(col("id"), col("band").cast("long").as("band"), col("key"))
      .transform(graft.ops.Pin.pin)
    val cands = banded.select(col("id").as("id_a"), col("band"), col("key"))
      .join(banded.select(col("id").as("id_b"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .transform(graft.ops.Pin.pin)
    val candIds = cands
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
    // restrict BEFORE shingling: the explode+window runs over candidate
    // docs only, not the corpus
    val sh = shingleRows(df.join(candIds, Seq(idCol), "left_semi"),
        idCol, textCol, shingleSize)
      .select(col("id"), unhex(md5(col("s").cast("binary"))).as("shh"))
      .transform(graft.ops.Pin.pin) // candidate-docs shingles only; reused twice below
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("nsh"))
    val common = cands
      .join(sh.select(col("id").as("id_a"), col("shh")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shh")), Seq("id_b", "shh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("nsh").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("nsh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "jaccard")
  }

  /** Full MinHash+LSH near-dup pipeline: signatures → banded candidates →
    * exact verification at `threshold`.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7, numHashes: Int = 64,
                      bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingleSize)
    val cands = minhashCandidates(sigs, idCol, bands, numHashes)
    verifyJaccard(cands, df, idCol, textCol, shingleSize)
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------- simhash

  /** Adds a 64-bit SimHash column of the token multiset: per bit, sign of
    * the sum of ±1 votes from each token's xxhash64. Pure expression folds
    * — no UDF, no explode; each document is one row through the
    * projection.
    *
    * Implementation note: one array-accumulator fold (token hash → 64-char
    * two's-complement bit string via `bin`, zipped into the vote array),
    * NOT 64 separate folds — the unrolled form re-inlines the tokenizer
    * per bit and grows generated code past Janino's 64 KB method limit,
    * silently dropping the whole stage to interpreted eval.
    */
  def withSimhash(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val hashes = transform(TextOps.tokens(col(textCol)), t => xxhash64(t))
    // LSB-first vote accumulation: reverse(lpad(bin(h),64,'0'))[b] = bit b.
    val votes = aggregate(hashes, array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, split(reverse(lpad(bin(h), 64, "0")), ""),
        (a, c) => a + when(c === "1", 1).otherwise(-1)))
    // Disjoint powers of two: plain addition assembles the bit pattern
    // (sign bit included — two's complement addition of disjoint bits).
    val pow2 = array((0 until 64).map(b => lit(1L << b)): _*)
    val sh = aggregate(
      zip_with(votes, pow2, (v, p) => when(v > 0, p).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    df.withColumn(outCol, sh)
  }

  /** (idCol, simhash) via explode + groupBy — the scalable form: per
    * (doc, token-hash) row the 64 per-bit votes are codegen'd long
    * arithmetic with map-side partial aggregation; the shuffle carries
    * 64 longs per document. Prefer this over [[withSimhash]] for large
    * corpora (the column-level fold is interpreted per row).
    */
  def simhashTable(df: DataFrame, idCol: String, textCol: String,
                   outCol: String = "simhash",
                   tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    val exploded = df.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col(idCol), tokenHash(col("tok")).as("h"))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$b")
    }
    val bits = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val sigs = exploded.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), bits.as(outCol))
    // Zero-token documents (null/empty text) produce no exploded rows and
    // would vanish from the groupBy; join the signatures back so every
    // input id survives, with simhash 0 (the withSimhash fold's value).
    df.select(col(idCol)).distinct()
      .join(sigs, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col(outCol), lit(0L)).as(outCol))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming <= maxDist. Candidates are pairs
    * sharing at least one of four 16-bit chunks (pigeonhole: any pair with
    * hamming <= 3 shares a chunk), then exact hamming verification.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3,
                      maxBucketSize: Int = 1000): DataFrame = {
    val withSh = simhashTable(df, idCol, textCol, "sh")
    val chunked = capBuckets(withSh.select(
      col(idCol), col("sh"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF(idCol, "sh", "chunk", "ch"), idCol, Seq("chunk", "ch"), maxBucketSize)
    val left = chunked.select(col(idCol).as("id_a"), col("sh").as("sh_a"),
      col("chunk"), col("ch"))
    val right = chunked.select(col(idCol).as("id_b"), col("sh").as("sh_b"),
      col("chunk"), col("ch"))
    left.join(right, Seq("chunk", "ch"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("dist", hamming(col("sh_a"), col("sh_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Benchmark decontamination scan (the published n-gram-overlap
    * protocol, e.g. GPT-3's 13-gram rule): training docs sharing at
    * least `minShared` DISTINCT word n-grams with any eval doc. Grams
    * are md5'd before the join — 16-byte keys shuffle, text never does
    * — and the eval gram set (bounded by the eval corpus) broadcasts,
    * so a 100 TB training sweep is one scan + broadcast-join + count.
    */
  def contamination(train: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, n: Int = 13,
                    minShared: Int = 1): DataFrame = {
    import graft.text.TextOps
    // grams dedupe PER DOC inside the row (array_distinct before the
    // explode — the same shape as the MinHash shingler), so every
    // (doc, gram) row is unique WITHOUT any distinct shuffle and the
    // final overlap count is a plain map-side-combining count
    val tg = train.select(col(idCol),
        explode(TextOps.distinctWordNgrams(col(textCol), n)).as("g"))
      .select(col(idCol), md5(col("g")).as("gh"))
    val eg = evalDocs
      .select(explode(TextOps.distinctWordNgrams(col(textCol), n)).as("g"))
      .select(md5(col("g")).as("gh")).distinct()
    tg.join(broadcast(eg), "gh")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Connected components over an undirected near-dup pair list
    * (`id_a`, `id_b`) — dedup needs GROUPS (keep one representative per
    * component), not pairs. Iterative min-label propagation: each round
    * every node takes the minimum label among itself and its neighbors;
    * convergence in graph-diameter rounds, each one hash-shuffled join +
    * one bounded count action. Near-dup graphs are stars/cliques around
    * a template (diameter ~2), so 2-3 rounds close them; `maxIter`
    * bounds pathological chains. At extreme scale the published
    * alternating large-star/small-star scheme (Kiveris et al.,
    * "Connected Components in MapReduce") halves round count on long
    * chains — the per-round join shape below is the same, so it is a
    * drop-in upgrade if diameters ever warrant it. Output: one row per
    * node, `group_id` = smallest member id of its component.
    */
  def dupGroups(pairs: DataFrame, maxIter: Int = 20,
                driverThreshold: Long = 100000L): DataFrame = {
    // HYBRID: a near-dup pair list is usually TINY relative to the
    // corpus (banded LSH caps bucket fan-out), and a bounded pair set
    // is a driver-trivial union-find — one collect instead of
    // 2×diameter distributed jobs. The label-propagation path below
    // remains the scale route for pair lists above the threshold.
    val spark = pairs.sparkSession
    // resolve the id columns BY NAME — a frame with extra leading
    // columns (or reordered ones) must not silently skip the driver
    // path or mis-detect types
    val fieldsByName = pairs.schema.fields.map(f => f.name -> f.dataType).toMap
    val idsLong = Seq("id_a", "id_b").forall(n =>
      fieldsByName.get(n).contains(org.apache.spark.sql.types.LongType))
    if (idsLong) {
      val p = pairs.select(col("id_a"), col("id_b")).cache()
      val nPairs = p.count()
      if (nPairs <= driverThreshold) {
        import spark.implicits._
        val edges = p.collect().map(r => (r.getLong(0), r.getLong(1)))
        p.unpersist(blocking = true)
        val parent = scala.collection.mutable.Map[Long, Long]()
        // iterative find with path-halving: a chain-shaped component at
        // the 100k-pair threshold is an in-envelope input, and a
        // recursive find would nest O(chain) frames and overflow the
        // driver stack. Path-halving keeps amortized near-O(1) finds
        // with a single constant-stack loop.
        def find(x0: Long): Long = {
          var x = x0
          var px = parent.getOrElse(x, x)
          while (px != x) {
            val ppx = parent.getOrElse(px, px)
            parent(x) = ppx // halve: point x at its grandparent
            x = ppx
            px = parent.getOrElse(x, x)
          }
          x
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        return edges.flatMap(e => Seq(e._1, e._2)).distinct.toSeq
          .map(x => (find(x), x)).toDF("group_id", "id")
      }
      p.unpersist(blocking = true)
    }
    // The per-round label state iterates as an RDD, not a DataFrame.
    // Round 7 finding: the DataFrame loop's logical plan embedded the
    // previous round's tree ~3x per round (nbrMin join + next join +
    // changed-count join each reference `labels`), so plans grew
    // exponentially with round count — a cache truncates EXECUTION but
    // not the PLAN, and merely materializing the execution-listener
    // plan description OOM'd the driver once a component needed ~8+
    // propagation hops. The RDD lineage is a shared DAG (linear), the
    // same bounded-state pattern as dtwKMeans' Lloyd loop, and
    // superseded rounds still release DETERMINISTICALLY via blocking
    // unpersist. Ids are cast to long — every near-dup pair producer in
    // this engine emits integral doc ids.
    {
      import org.apache.spark.sql.types._
      val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
      require(pairs.schema.fields.filter(f =>
        f.name == "id_a" || f.name == "id_b").forall(f => integral(f.dataType)),
        "dupGroups' distributed path requires integral ids (id_a, id_b)")
    }
    import spark.implicits._
    val edges = pairs
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].rdd
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) } // src -> dst
      .persist()
    var labels = edges.map(_._1).distinct().map(x => (x, x)).persist()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbrMin = edges.join(labels) // (src, (dst, src's lbl))
        .map { case (_, (dst, lbl)) => (dst, lbl) }
        .reduceByKey(math.min)
      val next = labels.leftOuterJoin(nbrMin)
        .mapValues { case (own, nbr) => math.min(own, nbr.getOrElse(own)) }
        .persist()
      changed = next.join(labels)
        .filter { case (_, (n, o)) => n != o }.count() // also materializes next
      labels.unpersist(blocking = true)
      labels = next
      it += 1
    }
    // Silent truncation would SPLIT components (duplicates survive
    // dedup) — refuse instead: the caller raises maxIter (or switches
    // to [[dupGroupsAltStar]] for huge diameters).
    if (changed != 0) {
      edges.unpersist(blocking = true)
      labels.unpersist(blocking = true)
      throw new IllegalStateException(
        s"dupGroups did not converge in $maxIter rounds — component diameter " +
          s"exceeds maxIter; raise it, or use dupGroupsAltStar (O(log n) rounds)")
    }
    // pin (lineage-truncating, eagerly materialized) rather than cache:
    // a returned cache the caller can't know to release would recreate
    // the deterministic-cleanup-debt class this function's per-round
    // blocking unpersists exist to avoid
    val out = graft.ops.Pin.pin(
      labels.map { case (id, lbl) => (lbl, id) }.toDF("group_id", "id"))
    edges.unpersist(blocking = true)
    labels.unpersist(blocking = true)
    out
  }

  /** Connected components by ALTERNATING STARS (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — the documented
    * long-diameter upgrade to [[dupGroups]]' per-hop label propagation:
    * each round applies large-star (every node's larger neighbors re-hang
    * off its minimum) then small-star (smaller neighbors and the center
    * re-hang off the minimum), which contracts chains geometrically —
    * O(log n) rounds instead of O(diameter). Per round: two
    * groupBy+join+distinct passes over the edge set and an anti-join
    * stability check, all on id-pair rows (text never enters). Same
    * output contract as dupGroups: one row per node, `group_id` =
    * smallest member id; throws rather than silently splitting
    * components if `maxIter` is exhausted.
    *
    * Prefer dupGroups for near-dup graphs (stars/cliques, diameter ~2:
    * one cheap join per round wins); prefer this when components can be
    * long paths (chained near-dup templates, transitive similarity).
    */
  def dupGroupsAltStar(pairs: DataFrame, maxIter: Int = 30): DataFrame =
    altStarImpl(pairs, maxIter)._1

  private[graft] def altStarImpl(pairs: DataFrame, maxIter: Int): (DataFrame, Int) = {
    import graft.ops.Pin
    val spark = pairs.sparkSession
    import spark.implicits._
    val nodes = pairs.select(col("id_a").cast("long").as("id"))
      .union(pairs.select(col("id_b").cast("long").as("id"))).distinct().cache()
    // The rounds iterate over an RDD, not a DataFrame: each star step
    // references the edge state twice (symmetrize) — as a Catalyst plan
    // that is a TREE that doubles per step and blows up analysis after a
    // handful of rounds, while the RDD lineage is a shared DAG (linear),
    // the same bounded-state pattern as dtwKMeans' Lloyd loop. Canonical
    // (a > b) undirected edge set throughout.
    var edges = pairs
      .filter(col("id_a") =!= col("id_b"))
      .select(greatest(col("id_a").cast("long"), col("id_b").cast("long")).as("a"),
        least(col("id_a").cast("long"), col("id_b").cast("long")).as("b"))
      .distinct()
      .as[(Long, Long)].rdd
      .persist()
    var rounds = 0
    var stable = edges.isEmpty()
    while (!stable && rounds < maxIter) {
      val ls = starStep(edges, large = true).persist()
      val ss = starStep(ls, large = false).persist()
      // stable when small-star output equals the previous round's edges
      val changed = ss.subtract(edges).count() + edges.subtract(ss).count()
      ls.unpersist(blocking = true)
      edges.unpersist(blocking = true)
      edges = ss
      rounds += 1
      stable = changed == 0
    }
    if (!stable) {
      edges.unpersist(blocking = true)
      nodes.unpersist(blocking = true)
      throw new IllegalStateException(
        s"dupGroupsAltStar did not converge in $maxIter rounds (expected O(log n))")
    }
    // converged edges form stars (child -> component minimum)
    val out = Pin.pin(
      nodes.join(edges.toDF("id", "lbl"), Seq("id"), "left")
        .select(coalesce(col("lbl"), col("id")).as("group_id"), col("id")))
    edges.unpersist(blocking = true)
    nodes.unpersist(blocking = true)
    (out, rounds)
  }

  // ------------------------------------------------- incremental dedup

  /** Batch-incremental exact dedup — the daily-crawl shape: classify an
    * incoming batch against an existing corpus WITHOUT re-deduping the
    * corpus. Per incoming document: `dup_corpus` (fingerprint already in
    * the corpus), `dup_batch` (an earlier incoming doc — smaller id —
    * has the same fingerprint), or `new`. Only 16-byte fingerprints
    * shuffle: the corpus side reduces to a distinct-fp stream, the
    * within-batch tie-break is a window over (fp, id) pairs; at 100 TB
    * the corpus fp set is a parquet table maintained across increments,
    * not recomputed (this method accepts it as `existing`).
    */
  def incrementalDedup(incoming: DataFrame, existing: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val in = incoming.select(col(idCol),
      TextOps.fingerprint(col(textCol)).as("fp"))
    val ex = existing.select(TextOps.fingerprint(col(textCol)).as("fp"))
      .distinct().withColumn("__in_corpus", lit(1))
    val w = Window.partitionBy("fp").orderBy(col(idCol))
    in.withColumn("__rn", row_number().over(w))
      .join(ex, Seq("fp"), "left")
      .select(col(idCol), col("fp"),
        when(col("__in_corpus").isNotNull, "dup_corpus")
          .when(col("__rn") > 1, "dup_batch")
          .otherwise("new").as("status"))
  }

  // ------------------------------------------------ duplicate-span dedup

  /** Merged duplicate n-gram spans per document — substring-granularity
    * dedup in the style of the published exact-substring protocol (see
    * the reference's dedup coverage; the technique: any word n-gram
    * occurring at least `minOccur` times ANYWHERE in the corpus —
    * including repeats inside one document — marks every position it
    * covers as duplicated; per document, overlapping-or-adjacent
    * duplicate windows merge into maximal spans [s, e] in token
    * positions, 1-based inclusive).
    *
    * 100 TB shape: the gram stream is a scan projection carrying
    * (doc_id, pos, 16-byte gram identity) — text never leaves the
    * scan; occurrence counting is one whole-partition window on the
    * identity; span merging windows over (doc_id, pos) int pairs
    * partitioned by document, so no single-partition stage exists
    * anywhere. Gram identities are engine-internal (they never
    * surface in output — spans are token POSITIONS) and are 128-BIT:
    * two independently-salted xxhash64 lanes, still 2.75× under the
    * hex-md5 payload the first cut shuffled. One 64-bit lane is NOT
    * enough here (ADVICE r13): a collision mints a FALSE duplicate
    * span, and at the 100 TB shape (10¹⁰⁺ distinct grams) the
    * birthday expectation N²/2⁶⁵ reaches whole false spans in
    * production, where the q121 oracle — which groups TRUE gram
    * strings and is the collision detector at test scale — never
    * executes. Two lanes put the expectation at N²/2¹²⁹ ≈ 10⁻¹⁹:
    * collision-safe at any physical corpus. (Set-membership uses like
    * [[verifyJaccard]]'s shingle identities keep the single-lane
    * trade — there a collision shifts one Jaccard estimate, it does
    * not fabricate output.)
    *
    * Returns one row per (doc, merged span): (doc_id, s, e).
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
               n: Int, minOccur: Int = 2): DataFrame = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    require(minOccur >= 2, s"minOccur must be >= 2, got $minOccur")
    val base = df.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
    // Guarded gram list: sequence(1, 0) in Spark DESCENDS ([1, 0]), so
    // the size >= n case must be gated explicitly, not left to sequence.
    // Two-level transform so the gram STRING binds once as a lambda
    // variable — referencing the array_join twice in one lambda would
    // re-run the slice+join per lane per position (the multi-reference
    // HOF re-evaluation class, commit ab2b3ea).
    val gramList = when(size(col("toks")) >= n,
        expr(s"transform(transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> array_join(slice(toks, i, $n), ' ')), " +
          "g -> named_struct('h1', xxhash64(g), 'h2', xxhash64('#ds2', g)))"))
      .otherwise(array().cast("array<struct<h1:bigint,h2:bigint>>"))
    val grams = base.select(col("doc_id"), posexplode(gramList))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col.h1").as("gh1"), col("col.h2").as("gh2"))
    // Occurrence counting as a whole-partition window over the gram
    // identity: ONE pass over the corpus and ONE gram-stream shuffle.
    // The groupBy-then-semi-join alternative scans the corpus twice
    // (the gram projection is recomputed on both sides) and still
    // shuffles the full gram stream for the join — measured 2.9 s vs
    // 2.4 s at sf0.1. A hash-hot gram only grows one window
    // partition's count scan, never a driver structure.
    val wGh = Window.partitionBy("gh1", "gh2")
    val dp = grams
      .withColumn("c", count(lit(1)).over(wGh))
      .filter(col("c") >= minOccur).select("doc_id", "pos")
    // Gaps-and-islands: a window starts a new span iff it begins past
    // the furthest end seen so far plus one (adjacent windows merge —
    // their covered token ranges are contiguous).
    val wPrev = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dp.withColumn("prev_end", max(col("pos") + (n - 1)).over(wPrev))
      .withColumn("new_island",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1)
          .otherwise(0))
      .withColumn("island_id", sum(col("new_island")).over(wRun))
      .groupBy("doc_id", "island_id")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (n - 1)).as("e"))
      .select("doc_id", "s", "e")
  }

  /** Per-document duplicate-span statistics: (doc_id, n_tokens,
    * n_dup_spans, dup_tokens, kept_tokens, spans_fp) for every document
    * with at least one merged span, where `spans_fp` is the md5 of the
    * ordered "s:e" span list — a bounded fingerprint of WHERE the
    * duplication sits, replayable by any engine.
    */
  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
                   n: Int, minOccur: Int = 2): DataFrame = {
    val nTok = df.select(col(idCol).as("doc_id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    val st = dupSpans(df, idCol, textCol, n, minOccur)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("s"), col("e")))),
          x => concat(x("s").cast("string"), lit(":"),
            x("e").cast("string"))), ",")).as("spans_fp"))
    st.join(nTok, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_dup_spans"),
        col("dup_tokens"),
        (col("n_tokens") - col("dup_tokens")).as("kept_tokens"),
        col("spans_fp"))
  }

  /** The rewritten documents: tokens covered by any merged duplicate
    * span are dropped, the rest re-join with single spaces. One row per
    * input document (docs with no spans pass through re-normalized).
    *
    * Scale note: pairing spans with text moves the TEXT through a
    * doc_id shuffle — the one unavoidable cost of a rewrite pass (any
    * substring-level dedup pays it exactly once, at output-writing
    * time); everything upstream of this join still shuffles only
    * hashes and int pairs. The span side aggregates to one bounded
    * array row per affected document before the join.
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
                     n: Int, minOccur: Int = 2): DataFrame = {
    val spans = dupSpans(df, idCol, textCol, n, minOccur)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("s"), col("e"))))
        .as("__spans"))
    val base = df.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("__toks"))
    base.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        array_join(filter(col("__toks"), (t, i) =>
          !exists(coalesce(col("__spans"),
              array().cast("array<struct<s:bigint,e:bigint>>")),
            sp => sp("s") <= i + 1 && i + 1 <= sp("e"))), " ")
          .as("cleaned"))
  }

  /** One star operation: from each center u with neighborhood Γ(u) and
    * m = min(Γ(u) ∪ {u}), re-hang the LARGER (large-star) or the
    * not-larger neighbors plus the center itself (small-star) off m.
    * Every undirected edge is covered from one of its endpoints' centers,
    * so no connectivity is lost; emitted edges are (x, m) with x > m —
    * already canonical.
    */
  private def starStep(edges: org.apache.spark.rdd.RDD[(Long, Long)],
                       large: Boolean): org.apache.spark.rdd.RDD[(Long, Long)] = {
    val sym = edges.flatMap { case (a, b) => Iterator((a, b), (b, a)) }
    val mins = sym.reduceByKey(math.min)
      .map { case (u, mv) => (u, math.min(mv, u)) }
    val j = sym.join(mins) // (u, (v, m))
    val hung =
      if (large) j.collect { case (u, (v, m)) if v > u => (v, m) }
      else j.collect { case (u, (v, m)) if v < u => (v, m) }.union(mins)
    hung.filter { case (a, b) => a != b }.distinct()
  }
}
