package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Supervised quality classification — the GPT-3 / LLaMA curation stage
  * (Brown et al. 2020 §A; Touvron et al. 2023): train a linear text
  * classifier to recognize "reference-like" documents (positives drawn
  * from a trusted corpus, negatives from the raw crawl) and keep crawl
  * documents stochastically by classifier score. The published form is
  * a fastText bag-of-words classifier; this engine's form is add-one
  * multinomial Naive Bayes over unigram identities, scored WITHOUT
  * logs so the whole protocol hash-checks cross-engine (the
  * [[LangModel]] / [[Retrieval]] transcendental-free trade):
  *
  *  - per token t, the class posterior under equal priors is
  *    r(t) = P(t|pos) / (P(t|pos) + P(t|neg)) with add-one smoothing —
  *    computed as ONE correctly-rounded double division of two EXACT
  *    integer products, (c_pos+1)·(n_neg+V) over
  *    (c_pos+1)·(n_neg+V) + (c_neg+1)·(n_pos+V), products carried as
  *    DECIMAL(38,0) so each PRODUCT stays exact well past Long range
  *    (the oracle replays them as HUGEINT; the products' SUM shares
  *    the precision-38 cap — see [[posterior]] for the documented
  *    corpus-size bound);
  *  - the document score is the exact-1e12-grid MEAN of r over its
  *    token occurrences (the [[LangModel.gridSum]] capture — mean
  *    posterior rather than the log-sum true NB, same ordering signal
  *    for gate decisions, exactly replayable), 0.5 (neutral) for docs
  *    with no alpha tokens;
  *  - `predicted` is score ≥ 0.5 — the equal-prior NB decision under
  *    the mean-pooled posterior.
  *
  * Scale shape (the [[LangModel]] frame): class counts shuffle on
  * 8-byte xxhash64 token KEYS (vocabulary-sized, never corpus-sized);
  * the corpus stream carries (id, token-hash) rows; the model folds
  * back onto the occurrence stream as one left join — broadcast when
  * a MEASURED count of the pinned stats frame proves it small
  * ([[LangModel.BroadcastModelLimit]], the JoinInvariantSpec
  * reviewed-gate pattern), AQE-sized otherwise — plus the hinted
  * 1-row totals frame; the per-doc reduce is one map-side-combined
  * aggregate. The q199 oracle replays the protocol over TRUE token
  * strings, so the hash compare doubles as the 64-bit collision
  * detector at test scale.
  *
  * Corpus-size bound for the single-lane token identity (the
  * [[graft.dedup.Dedup.dupSpans]] analysis, applied — the oracle
  * never runs where a collision is expected): at a 100 TB corpus the
  * train vocabulary reaches ~10⁹–10¹⁰ distinct alpha tokens, so the
  * birthday expectation n²/2⁶⁵ admits a handful of colliding token
  * pairs. The effect is BOUNDED and benign, so one lane suffices
  * where dupSpans needed two: a collision merges two tokens' class
  * counts, perturbing one likelihood ratio by roughly one extra
  * observation against the V-sized smoothing denominator — a nudge
  * to a heuristic quality score. No document row is dropped,
  * fabricated, or re-keyed (doc ids never pass through the token
  * hash), and the acceptance gate consumes the score's ORDER, not an
  * exact count. dupSpans mints output rows from identity equality —
  * a collision there fabricates a false span, hence its 128 bits.
  */
object Classifier {

  private[graft] def tokHashArr(textCol: Column): Column = {
    val t = filter(TextOps.tokens(textCol), t => t.rlike("^[a-z]+$"))
    transform(t, w => xxhash64(w))
  }

  /** A trained NB model as reusable artifacts: per-token class counts
    * (th, c_pos, c_neg) pinned and vocabulary-sized, plus the three
    * scalars — total train token occurrences per class and the shared
    * train vocabulary size. The static side of
    * [[graft.streaming.Streaming.classifyStream]]'s stream-static
    * join; train batch-side, score forever.
    */
  final case class NbModel(stats: DataFrame, nPos: Long, nNeg: Long,
                           vocabSize: Long)

  /** Train an [[NbModel]] from the rows where `isTrain` holds, with
    * `isPos` as the class label (the scalars are a 1-row collect — the
    * k-means-centroid precedent: model fitting is an action).
    */
  def trainNbModel(docs: DataFrame, idCol: String, textCol: String,
                   isTrain: Column, isPos: Column): NbModel = {
    val stats = graft.ops.Pin.pin(docs.filter(isTrain)
      .select(isPos.as("__pos"),
        explode(tokHashArr(col(textCol))).as("th"))
      .groupBy("th")
      .agg(count(when(col("__pos"), lit(1))).as("c_pos"),
        count(when(!col("__pos"), lit(1))).as("c_neg")))
    val tot = stats.agg(
      coalesce(sum(col("c_pos")), lit(0L)).cast("long"),
      coalesce(sum(col("c_neg")), lit(0L)).cast("long"),
      count(lit(1))).collect()(0)
    NbModel(stats, tot.getLong(0), tot.getLong(1), tot.getLong(2))
  }

  /** Persist a trained [[NbModel]]: the count frame as parquet, the
    * scalars as driver-side JSON (the [[graft.ml.Artifacts]] K3
    * contract — parquet for distributed state, JSON for scalars).
    */
  def saveNbModel(model: NbModel, dir: String): Unit = {
    model.stats.write.mode("overwrite").parquet(s"$dir/stats")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "meta.json"),
      s"""{"nPos":${model.nPos},"nNeg":${model.nNeg},"vocabSize":${model.vocabSize}}""")
  }

  def loadNbModel(spark: org.apache.spark.sql.SparkSession,
                  dir: String): NbModel = {
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "meta.json")))
    NbModel(spark.read.parquet(s"$dir/stats"), meta.get("nPos").asLong(),
      meta.get("nNeg").asLong(), meta.get("vocabSize").asLong())
  }

  /** The per-token posterior r = P(t|pos)/(P(t|pos)+P(t|neg)) as one
    * correctly-rounded division of exact DECIMAL(38,0) integer
    * products, shared by the batch core, the model scorer, and the
    * streaming twin so all three provably share arithmetic. Inputs are
    * the (nullable) per-token class counts and the three total
    * columns; `greatest(V, 1)` pins the empty-model degenerate case to
    * r = 0.5 everywhere (bounded, defined) and is an exact no-op
    * whenever any train token exists.
    *
    * Exactness bound (ADVICE r13): each PRODUCT is two sub-2⁶³ longs,
    * so it tops out below 2¹²⁶ ≈ 8.6e37 and always fits DECIMAL(38,0)
    * exactly — but the SUM `num + alt` is also capped at precision 38
    * (Spark's max), so it can overflow — to null under non-ANSI
    * semantics, silently dropping the token from `count(r)` — once
    * each product approaches ~5e37, i.e. once a per-class occurrence
    * total passes ~7·10¹⁸ (≈ Long.MaxValue·¾; counts come from
    * `count()`, which is itself a long). A 100 TB corpus is ~10¹⁴
    * token occurrences — 4+ orders of headroom — so the bound is
    * documented rather than engineered around; the oracle's HUGEINT
    * (int128) replay stays exact to the same corpus sizes and far
    * beyond.
    */
  private[graft] def posterior(cPos: Column, cNeg: Column, nPos: Column,
                                nNeg: Column, v: Column): Column = {
    val d19 = DecimalType(19, 0)
    val num = (coalesce(cPos, lit(0L)) + lit(1L)).cast(d19) *
      (nNeg + greatest(v, lit(1L))).cast(d19)
    val alt = (coalesce(cNeg, lit(0L)) + lit(1L)).cast(d19) *
      (nPos + greatest(v, lit(1L))).cast(d19)
    num.cast("double") / (num + alt).cast("double")
  }

  /** Shared scoring core: one corpus scan (explode_OUTER keeps a
    * null-token row for alpha-token-free docs, so the aggregate covers
    * every input id — no re-attach join), the train flag and class
    * label threaded through. Returns
    * (idCol, __tr, __pos, n_tokens, n_unseen, score, predicted).
    */
  private def nbScored(docs: DataFrame, idCol: String, textCol: String,
                       isTrain: Column, isPos: Column): DataFrame = {
    val occ = graft.ops.Pin.pin(docs
      .select(col(idCol), isTrain.as("__tr"), isPos.as("__pos"),
        explode_outer(tokHashArr(col(textCol))).as("th")))
    val stats = graft.ops.Pin.pin(
      occ.filter(col("__tr") && col("th").isNotNull)
        .groupBy("th")
        .agg(count(when(col("__pos"), lit(1))).as("c_pos"),
          count(when(!col("__pos"), lit(1))).as("c_neg")))
    // 1-row totals frame (always hinted, the LangModel vocab shape)
    val tot = stats.agg(
      coalesce(sum(col("c_pos")), lit(0L)).cast("long").as("n_pos"),
      coalesce(sum(col("c_neg")), lit(0L)).cast("long").as("n_neg"),
      count(lit(1)).as("V"))
    // the model-join hint is AUTO-GATED on the measured
    // (already-pinned) vocabulary count — the
    // [[LangModel.BroadcastModelLimit]] rationale verbatim: the pinned
    // frame reports no measured stats, so without the gate the
    // vocabulary-sized join was planned sort-merge at large n and
    // exchanged the corpus-sized occurrence stream (measured 506 MB of
    // shuffle at 1M docs vs ~3 MB gated, SCALE.md round 13)
    val statsJ =
      if (stats.count() <= LangModel.BroadcastModelLimit) broadcast(stats)
      else stats
    occ
      .join(statsJ, Seq("th"), "left")
      .crossJoin(broadcast(tot))
      .select(col(idCol), col("__tr"), col("__pos"),
        (col("th").isNotNull && col("c_pos").isNull).as("unseen"),
        when(col("th").isNotNull,
          posterior(col("c_pos"), col("c_neg"), col("n_pos"),
            col("n_neg"), col("V"))).as("r"))
      .groupBy(col(idCol))
      // __tr/__pos are functionally dependent on the group key (one
      // flag each per doc), so first() is deterministic here
      .agg(first(col("__tr")).as("__tr"), first(col("__pos")).as("__pos"),
        count(col("r")).as("n_tokens"),
        count(when(col("unseen"), lit(1))).as("n_unseen"),
        LangModel.gridSum(col("r")).as("__rs"))
      .select(col(idCol), col("__tr"), col("__pos"), col("n_tokens"),
        col("n_unseen"),
        when(col("n_tokens") > 0,
          LangModel.gridMean(col("__rs"), col("n_tokens")))
          .otherwise(lit(0.5)).as("score"))
      .withColumn("predicted", col("score") >= lit(0.5))
  }

  /** Per-document NB quality scores against a model trained on the
    * `isTrain` rows with `isPos` labels — every doc is scored, train
    * rows too (the GPT-3 shape: train on reference-vs-crawl, score the
    * whole crawl). Output per input row: (idCol, n_tokens, n_unseen,
    * score, predicted) — `n_unseen` counts tokens absent from the
    * train vocabulary, the out-of-domain signal add-one smoothing
    * absorbs.
    */
  def nbQualityWithTrain(docs: DataFrame, idCol: String, textCol: String,
                         isTrain: Column, isPos: Column): DataFrame =
    nbScored(docs, idCol, textCol, isTrain, isPos)
      .select(col(idCol), col("n_tokens"), col("n_unseen"), col("score"),
        col("predicted"))

  /** The salted-hash-split form (the q150 unit-interval convention):
    * train on the `trainFrac` partition, score everything, the split
    * and class labels riding the single corpus scan.
    */
  def nbQuality(docs: DataFrame, idCol: String, textCol: String,
                isPos: Column, trainFrac: Double = 0.8,
                salt: String = "#nb"): DataFrame =
    nbScored(docs, idCol, textCol,
        unitHash(idCol, salt) < trainFrac, isPos)
      .select(col(idCol),
        when(col("__tr"), "train").otherwise("held").as("split"),
        when(col("__pos"), "ref").otherwise("other").as("label"),
        col("n_tokens"), col("n_unseen"), col("score"), col("predicted"))

  /** Score a batch frame against an already-trained (possibly
    * [[loadNbModel]]-reloaded) model — the batch twin of
    * [[graft.streaming.Streaming.classifyStream]], same columns and
    * arithmetic as [[nbQualityWithTrain]]'s scoring half.
    */
  def scoreWithNbModel(docs: DataFrame, idCol: String, textCol: String,
                       model: NbModel): DataFrame =
    docs
      .select(col(idCol), explode_outer(tokHashArr(col(textCol))).as("th"))
      .join(model.stats, Seq("th"), "left")
      .select(col(idCol),
        (col("th").isNotNull && col("c_pos").isNull).as("unseen"),
        when(col("th").isNotNull,
          posterior(col("c_pos"), col("c_neg"), lit(model.nPos),
            lit(model.nNeg), lit(model.vocabSize))).as("r"))
      .groupBy(col(idCol))
      .agg(count(col("r")).as("n_tokens"),
        count(when(col("unseen"), lit(1))).as("n_unseen"),
        LangModel.gridSum(col("r")).as("__rs"))
      .select(col(idCol), col("n_tokens"), col("n_unseen"),
        when(col("n_tokens") > 0,
          LangModel.gridMean(col("__rs"), col("n_tokens")))
          .otherwise(lit(0.5)).as("score"))
      .withColumn("predicted", col("score") >= lit(0.5))

  /** GPT-3's stochastic acceptance rule (Brown et al. 2020 §A:
    * keep a crawl document iff `pareto(α) > 1 − score`) with the
    * Pareto draw made deterministic and replayable: the uniform comes
    * from the q150 salted md5 unit hash, and at α = 1 the inverse-CDF
    * Pareto transform is RATIONAL — pareto₁(u) = 1/u − 1 — so the
    * whole keep decision is exact double arithmetic any engine
    * replays bit-for-bit (the transcendental-free trade again; α ≠ 1
    * needs `pow(u, −1/α)`, which a hash-compare contract can't use —
    * callers wanting the published α = 9 get the same decision
    * boundary family, just a different acceptance rate). Emits the
    * input columns plus `keep`.
    */
  def paretoAccept(scored: DataFrame, idCol: String, scoreCol: String,
                   salt: String = "#nbacc"): DataFrame =
    scored.withColumn("keep",
      (lit(1.0) / unitHash(idCol, salt) - lit(1.0)) >
        (lit(1.0) - col(scoreCol)))

  /** The q150 salted-hash unit-interval expression (shared convention
    * with [[LangModel]]; duplicated because that form is private).
    */
  private def unitHash(idCol: String, salt: String): Column =
    (graft.dedup.Dedup.md5Hash64(
        concat(col(idCol).cast("string"), lit(salt))).cast("double") +
      lit(9.223372036854776e18)) / lit(1.8446744073709552e19)
}
