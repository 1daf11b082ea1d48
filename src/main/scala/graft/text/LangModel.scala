package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** N-gram language-model fluency scoring — the CCNet curation stage
  * (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data"): score each document against a
  * language model trained on a reference partition, and filter/bucket
  * the corpus by how predictable its text is. CCNet uses KenLM 5-gram
  * perplexity; this engine's form is an add-one-smoothed BIGRAM model
  * with the perplexity surrogate chosen for cross-engine exactness —
  * the same trade [[Retrieval]] makes for BM25's idf: a log/exp
  * perplexity is transcendental (two engines' `ln` may differ in the
  * last ulp, so a hash-compare contract cannot use it), so the score is
  * the per-document MEAN CONDITIONAL PROBABILITY of its bigrams,
  * captured on the exact 1e12 decimal grid. Monotone in the arithmetic
  * mean of p(wᵢ|wᵢ₋₁) rather than the geometric mean true perplexity
  * uses — same "how predictable is this text" ordering signal for
  * gate/bucket decisions, exactly replayable by any engine with
  * correctly-rounded double division.
  *
  * Scale shape: bigram counts and probabilities shuffle on bigram KEYS
  * (vocabulary-sized); the corpus stream carries only (id, bigram)
  * rows and the per-doc reduce is one map-side-combined aggregate.
  * The probability table joins back to the occurrence stream AQE-sized
  * — it is a distinct-bigram frame (data-dependent), so no broadcast
  * hint (the JoinInvariantSpec forced-broadcast invariant). The only
  * hinted frame is the grouping-less 1-row vocabulary count.
  */
object LangModel {

  private val Grid = 1.0e12

  private def tokArr(textCol: Column): Column =
    filter(TextOps.tokens(textCol), t => t.rlike("^[a-z]+$"))

  /** (u, v) bigram structs of the lowercase alpha tokens, in order,
    * with occurrence multiplicity. zip_with over two slices — NOT an
    * index-lambda with element_at(t, i): a non-lambda subexpression
    * inside a higher-order-function body re-evaluates PER ELEMENT, so
    * the element_at form re-ran the regex token filter O(tokens²) times
    * per document (measured 11.9 s for q195 at sf0.1; this form runs
    * the filter O(1) per row and the query in ~1 s).
    */
  private def bigramArr(textCol: Column): Column = {
    val t = tokArr(textCol)
    when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("u"), b.as("v"))))
      .otherwise(array().cast("array<struct<u:string,v:string>>"))
  }

  /** (bh, uh, vh) xxhash64 identity structs of the doc's bigrams —
    * bigram, context and successor as 8-byte keys (the
    * [[graft.dedup.Dedup.verifyJaccard]] 64-bit-identity trade; the
    * q195 oracle replays true strings and doubles as the collision
    * detector). The hash lambda only touches the bound lambda variable,
    * so this stays O(bigrams) per row.
    */
  def bigramHashArr(textCol: Column): Column =
    transform(bigramArr(textCol), b => struct(
      xxhash64(b.getField("u"), b.getField("v")).as("bh"),
      xxhash64(b.getField("u")).as("uh"),
      xxhash64(b.getField("v")).as("vh")))

  /** A trained add-one bigram LM as reusable artifacts: per-bigram
    * counts (bh, c_uv), per-context counts (uh, c_u) — both pinned,
    * vocabulary-sized — and the successor-vocabulary size. The static
    * side of [[graft.streaming.Streaming.fluencyStream]]'s
    * stream-static joins; train it batch-side, score forever.
    */
  final case class FluencyModel(cuv: DataFrame, cu: DataFrame, vocabSize: Long)

  /** Train a [[FluencyModel]] from the rows where `isTrain` holds —
    * the same counts [[bigramFluencyWithTrain]] derives internally
    * (vocabSize is a 1-row collect, the k-means-centroid artifact
    * precedent: model fitting is an action).
    */
  def trainBigramModel(docs: DataFrame, idCol: String, textCol: String,
                       isTrain: Column): FluencyModel = {
    // one corpus pass: group by (bh, uh, vh) — uh/vh are functionally
    // dependent on bh, so this is the bh partition — then pin the
    // vocabulary-sized counts and derive contexts + vocab size from them
    val cuv = graft.ops.Pin.pin(docs.filter(isTrain)
      .select(explode(bigramHashArr(col(textCol))).as("b"))
      .groupBy(col("b.bh").as("bh"), col("b.uh").as("uh"),
        col("b.vh").as("vh"))
      .agg(count(lit(1)).as("c_uv")))
    val cu = cuv.groupBy("uh").agg(sum(col("c_uv")).as("c_u"))
    val v = cuv.agg(countDistinct(col("vh"))).collect()(0).getLong(0)
    FluencyModel(graft.ops.Pin.pin(cuv.select("bh", "c_uv")),
      graft.ops.Pin.pin(cu), v)
  }

  /** Persist a trained [[FluencyModel]]: the two count frames as
    * parquet, the vocab size as driver-side JSON (the
    * [[graft.ml.Artifacts]] K3 contract — parquet for distributed
    * state, JSON for scalars).
    */
  def saveModel(model: FluencyModel, dir: String): Unit = {
    model.cuv.write.mode("overwrite").parquet(s"$dir/cuv")
    model.cu.write.mode("overwrite").parquet(s"$dir/cu")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "meta.json"),
      s"""{"vocabSize":${model.vocabSize}}""")
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession,
                dir: String): FluencyModel = {
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "meta.json")))
    FluencyModel(spark.read.parquet(s"$dir/cuv"),
      spark.read.parquet(s"$dir/cu"), meta.get("vocabSize").asLong())
  }

  /** Score a batch frame against an already-trained (possibly
    * [[loadModel]]-reloaded) model — the batch twin of
    * [[graft.streaming.Streaming.fluencyStream]], same columns and
    * arithmetic as [[bigramFluencyWithTrain]]'s scoring half.
    */
  def scoreWithModel(docs: DataFrame, idCol: String, textCol: String,
                     model: FluencyModel): DataFrame = {
    val per = docs
      .select(col(idCol), explode(bigramHashArr(col(textCol))).as("b"))
      .select(col(idCol), col("b.bh").as("bh"), col("b.uh").as("uh"))
      .join(model.cuv, Seq("bh"), "left")
      .join(model.cu, Seq("uh"), "left")
      .select(col(idCol), col("c_uv").isNull.as("unseen"),
        ((coalesce(col("c_uv"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c_u"), lit(0L)) + lit(math.max(model.vocabSize, 1L)))
            .cast("double")).as("p"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("unseen"), lit(1))).as("n_unseen"),
        gridSum(col("p")).as("__ps"))
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        gridMean(col("__ps"), col("n_bigrams")).as("mean_cond_p"))
  }

  /** Grid capture of a probability column — shared by the batch and
    * streaming scorers so the two paths provably share arithmetic.
    */
  private[graft] def gridSum(p: Column): Column =
    sum(round(p * lit(Grid), 0).cast(DecimalType(38, 0)))

  private[graft] def gridMean(ps: Column, n: Column): Column =
    when(n > 0, ps.cast("double") / lit(Grid) / n.cast("double"))
      .otherwise(lit(0.0))

  /** Per-document bigram-LM fluency against a model trained on the rows
    * where `isTrain` holds (every doc is scored, train rows too — the
    * CCNet shape trains on the reference partition and scores the whole
    * crawl). Output per input row:
    * (idCol, n_bigrams, n_unseen, mean_cond_p) where
    * p(v|u) = (c(uv)+1)/(c(u)+V), c from train-occurrence counts,
    * V = distinct successor-token count of the train bigrams, and
    * mean_cond_p is the exact-grid mean (0.0 for docs with <2 alpha
    * tokens). `n_unseen` counts bigrams absent from the train model —
    * the held-out novelty signal add-one smoothing absorbs.
    */
  def bigramFluencyWithTrain(docs: DataFrame, idCol: String, textCol: String,
                             isTrain: Column): DataFrame = {
    // One (id, bigram) occurrence stream, pinned (train counts and the
    // scoring reduce both read it — re-deriving would re-tokenize the
    // corpus twice). Bigram/context/successor travel as 64-BIT
    // xxhash64 identities, never strings — the [[graft.dedup.Dedup]]
    // shingle-identity trade (`verifyJaccard`'s "64-bit identities"):
    // every shuffle and join key is 8 bytes, and the q195 oracle, which
    // replays the protocol over the TRUE strings, doubles as the
    // collision detector (a 64-bit collision would shift a count and
    // fail the hash compare; P ≈ n²/2⁶⁵).
    val occ = graft.ops.Pin.pin(docs
      .select(col(idCol), isTrain.as("__tr"),
        explode(bigramHashArr(col(textCol))).as("b"))
      .select(col(idCol), col("__tr"),
        col("b.bh").as("bh"), col("b.uh").as("uh"), col("b.vh").as("vh")))
    val train = occ.filter(col("__tr"))
    // uh/vh are functionally dependent on bh, so grouping by all three
    // is the same partition as by bh alone — and carrying them through
    // ONE pinned count lets the context roll-up AND the vocabulary
    // count derive from the vocabulary-sized frame instead of each
    // replaying the corpus-sized aggregation (a .explain audit showed
    // the unpinned form running the occurrence shuffle three times)
    val cuv = graft.ops.Pin.pin(
      train.groupBy("bh", "uh", "vh").agg(count(lit(1)).as("c_uv")))
    val cu = cuv.groupBy("uh").agg(sum(col("c_uv")).as("c_u"))
    val vocab = cuv.agg(countDistinct(col("vh")).as("V"))
    // fold the model straight onto the occurrence stream: two AQE-sized
    // left joins on 8-byte keys + the 1-row V broadcast (the only hint)
    val per = occ
      .join(cuv.select(col("bh"), col("c_uv")), Seq("bh"), "left")
      .join(cu, Seq("uh"), "left")
      .crossJoin(broadcast(vocab))
      // greatest(V, 1): an EMPTY train partition would otherwise make
      // every denominator 0 and every p Infinity — the guard pins the
      // degenerate model to p = 1 per bigram (bounded, defined), and is
      // an exact no-op whenever any train bigram exists (V >= 1)
      .select(col(idCol), col("c_uv").isNull.as("unseen"),
        ((coalesce(col("c_uv"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c_u"), lit(0L)) + greatest(col("V"), lit(1L)))
            .cast("double")).as("p"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("unseen"), lit(1))).as("n_unseen"),
        gridSum(col("p")).as("__ps"))
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        gridMean(col("__ps"), col("n_bigrams")).as("mean_cond_p"))
  }

  /** The salted-hash-split form: train on the `trainFrac` partition of
    * the q150 unit-interval hash (stable under reruns and corpus
    * growth, replayable by any md5-capable engine), score everything.
    * Adds the split label for interpretability.
    */
  def bigramFluency(docs: DataFrame, idCol: String, textCol: String,
                    trainFrac: Double = 0.8,
                    salt: String = "#lm"): DataFrame = {
    val uu = (graft.dedup.Dedup.md5Hash64(
        concat(col(idCol).cast("string"), lit(salt))).cast("double") +
      lit(9.223372036854776e18)) / lit(1.8446744073709552e19)
    bigramFluencyWithTrain(docs, idCol, textCol, uu < trainFrac)
      .join(docs.select(col(idCol),
        when(uu < trainFrac, "train").otherwise("held").as("split")), idCol)
      .select(idCol, "split", "n_bigrams", "n_unseen", "mean_cond_p")
  }
}
