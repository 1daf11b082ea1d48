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

  /** "u v" bigram strings of the lowercase alpha tokens, in order, with
    * occurrence multiplicity (tokens are ^[a-z]+$ so the space join is
    * unambiguous and contexts recover via substring_index).
    */
  private def bigramArr(textCol: Column): Column = {
    val t = tokArr(textCol)
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

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
    // one (id, bigram) occurrence stream, pinned: train counts, the
    // distinct-bigram probability table, and the scoring reduce all
    // read it (re-deriving would re-tokenize the corpus three times)
    val occ = graft.ops.Pin.pin(docs
      .select(col(idCol), isTrain.as("__tr"),
        explode(bigramArr(col(textCol))).as("bg")))
    val train = occ.filter(col("__tr"))
    val cuv = train.groupBy("bg").agg(count(lit(1)).as("c_uv"))
    val cu = cuv.groupBy(substring_index(col("bg"), " ", 1).as("bg_u"))
      .agg(sum(col("c_uv")).as("c_u"))
    val vocab = train.agg(
      countDistinct(substring_index(col("bg"), " ", -1)).as("V"))
    // probability per DISTINCT corpus bigram (vocabulary-sized work),
    // joined back to the occurrence stream AQE-sized — no hints on the
    // data-dependent frames; the 1-row V aggregate is the only hint
    val pb = occ.select("bg").distinct()
      .join(cuv, Seq("bg"), "left")
      .join(cu, substring_index(col("bg"), " ", 1) === col("bg_u"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("bg"), col("c_uv").isNull.as("unseen"),
        ((coalesce(col("c_uv"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c_u"), lit(0L)) + col("V")).cast("double")).as("p"))
    val per = occ.join(pb, "bg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("unseen"), lit(1))).as("n_unseen"),
        sum(round(col("p") * lit(Grid), 0).cast(DecimalType(38, 0))).as("__ps"))
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        when(col("n_bigrams") > 0,
          col("__ps").cast("double") / lit(Grid) /
            col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)).as("mean_cond_p"))
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
