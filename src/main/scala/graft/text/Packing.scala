package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the training-pipeline stage between curation and
  * shard writing: variable-length tokenized documents are packed into
  * fixed-capacity training sequences (greedy first-fit in a pinned
  * order), and the packed assignment feeds `Csv.shardedSink` for the
  * on-disk shard layout.
  *
  * Greedy packing is inherently sequential — each document's sequence
  * depends on the fill state left by every predecessor — so the global
  * form cannot be expressed as a window/prefix computation. The scale
  * unit here is the BUCKET: documents are deterministically bucketed
  * (`doc_id % buckets`), each bucket packs independently in md5 order,
  * and sequence ids are namespaced (bucket, seq). That is exactly how a
  * real corpus packs at 100 TB — per output shard, not globally — and it
  * makes the whole operation embarrassingly parallel AND replayable by
  * an oracle (per-bucket greedy scans advance in lockstep in a single
  * recursive CTE). Raise `buckets` with corpus size; each bucket's doc
  * list must fit a task's streaming pass (state is O(1)).
  *
  * Determinism contract: order within a bucket is (md5(doc_id), doc_id)
  * — no data-dependent tie; documents longer than `maxLen` are truncated
  * to `maxLen` tokens (the standard packing convention) and therefore
  * occupy a full sequence alone.
  */
object Packing {

  /** Pack `docs` into (bucket, seq, doc_id, n_tokens, fill_ratio) rows:
    * one row per document, `fill_ratio` = packed tokens of its sequence
    * / `maxLen`. `tokensCol` is the document's token count (any
    * deterministic count column, e.g. [[TextOps.tokenCount]]).
    */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
                    maxLen: Int, buckets: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val prepped = docs.select(
      col(idCol).cast("long").as("doc_id"),
      least(col(tokensCol).cast("long"), lit(maxLen.toLong)).as("toks"),
      pmod(col(idCol).cast("long"), lit(buckets.toLong)).as("bucket"),
      md5(col(idCol).cast("string").cast("binary")).as("h"))
    // each bucket's docs are contiguous and md5-ordered within their
    // partition, so one streaming pass packs them with O(1) state; the
    // per-bucket reset makes the result independent of which partition
    // a bucket lands in
    val packed = prepped
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions("bucket", "h", "doc_id")
      .select("bucket", "doc_id", "toks")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curB = Long.MinValue
        var seq = 0L
        var fill = 0L
        it.map { case (b, id, t) =>
          if (b != curB) { curB = b; seq = 0L; fill = 0L }
          // first-fit-in-order: overflow opens the next sequence; a
          // zero-token doc never opens one (fill+0 <= maxLen always)
          if (fill + t > maxLen && fill > 0) { seq += 1; fill = t }
          else fill += t
          (b, seq, id, t)
        }
      }
      .toDF("bucket", "seq", "doc_id", "n_tokens")
    // (bucket, seq) groups are capacity-bounded (<= maxLen tokens), so
    // the window is small and partition-parallel; long sums are exact,
    // the single double division replays anywhere
    val w = Window.partitionBy("bucket", "seq")
    packed.withColumn("fill_ratio",
      sum(col("n_tokens")).over(w).cast("double") / lit(maxLen.toDouble))
  }

  /** Concat-and-cut layout — the OTHER standard packing scheme (the
    * GPT-pretraining shape): the whole corpus is one virtual token
    * stream in a deterministic epoch order ([[Mixing.epochShuffle]]'s
    * hash family), documents separated by an end-of-document token, and
    * training examples are fixed-length cuts of that stream. Unlike
    * [[packSequences]] (greedy first-fit, no doc ever crosses a
    * sequence boundary), here documents straddle example boundaries and
    * nothing is wasted but the final ragged tail.
    *
    * Returns (frame + `start_off` column, total stream length): each
    * document's exclusive global token offset — the doc→example index
    * map a data loader needs is plain arithmetic on `start_off`.
    * Offsets come from [[graft.ops.Splits.withGlobalPrefixSumCols]]
    * (range partition + subtotal offsets — never a single-partition
    * running-sum window). `costCol` must already include the separator
    * (+1 per doc).
    */
  def concatOffsets(docs: DataFrame, idCol: String, costCol: String,
                    epoch: Long, salt: String = "graft-epoch"): (DataFrame, Long) = {
    val keyed = docs.withColumn("__h",
      graft.dedup.Dedup.md5Hash64(
        concat(lit(s"$salt#$epoch#"), col(idCol).cast("string"))))
    val (off, total) = graft.ops.Splits.withGlobalPrefixSumCols(keyed,
      Seq(col("__h"), col(idCol)), costCol, "start_off")
    (off.drop("__h"), total)
  }

  /** Padding-efficiency audit — the batch-shaping decision table: how
    * many slot-tokens each sequence-construction strategy spends to
    * carry the corpus's useful tokens at a fixed `maxLen`, as one row
    * per strategy (n_sequences, slot/useful/padding tokens,
    * efficiency = useful/slots):
    *
    *  - `pad_to_max`: every document splits into ceil(len/maxLen)
    *    sequences, each padded to maxLen — the naive collator.
    *  - `bucketed`: full chunks cost maxLen; the final chunk pads only
    *    to the smallest bucket that fits it (`buckets` ascending, maxLen
    *    implied as the ceiling) — the bucketed-batching compromise.
    *  - `packed`: documents concatenate into ceil(total/maxLen) blocks
    *    (q169's concat-and-cut layout) — padding only in the last block.
    *
    * Everything is exact integer arithmetic over one scan aggregate
    * (chunk counts and bucket slots are per-row projections; no shuffle
    * beyond the 1-row aggregate), so the table replays in any engine.
    * Zero-token documents contribute zero chunks in every strategy.
    */
  def paddingEfficiency(docs: DataFrame, tokensCol: String, maxLen: Int,
                        buckets: Seq[Int]): DataFrame = {
    require(maxLen >= 1, "maxLen >= 1")
    require(buckets.forall(b => b >= 1 && b <= maxLen), "buckets within (0, maxLen]")
    val l = col(tokensCol).cast("long")
    val chunks = expr(s"(CAST($tokensCol AS BIGINT) + ${maxLen - 1}) div $maxLen")
    val lastLen = l - (chunks - lit(1L)) * maxLen
    val lastSlot = buckets.sorted.foldRight(lit(maxLen.toLong): org.apache.spark.sql.Column)(
      (b, acc) => when(lastLen <= b, lit(b.toLong)).otherwise(acc))
    // the whole bucketed term gates on l > 0: a zero-token doc has
    // chunks = 0, and an unguarded (chunks-1)·maxLen would contribute
    // NEGATIVE slots
    val agg = docs.agg(
      sum(chunks).as("n_seq"),
      sum(l).as("useful"),
      sum(when(l > 0, (chunks - lit(1L)) * maxLen + lastSlot).otherwise(lit(0L)))
        .as("bucketed_slots"))
    val strategies = agg.select(explode(array(
      struct(lit("1_pad_to_max").as("strategy"),
        col("n_seq").as("n_sequences"),
        (col("n_seq") * maxLen).as("slot_tokens"),
        col("useful").as("useful_tokens")),
      struct(lit("2_bucketed").as("strategy"),
        col("n_seq").as("n_sequences"),
        col("bucketed_slots").as("slot_tokens"),
        col("useful").as("useful_tokens")),
      struct(lit("3_packed").as("strategy"),
        expr(s"(useful + ${maxLen - 1}) div $maxLen").as("n_sequences"),
        (expr(s"(useful + ${maxLen - 1}) div $maxLen") * maxLen).as("slot_tokens"),
        col("useful").as("useful_tokens")))).as("s"))
      .select("s.strategy", "s.n_sequences", "s.slot_tokens", "s.useful_tokens")
    strategies
      .withColumn("padding_tokens", col("slot_tokens") - col("useful_tokens"))
      .withColumn("efficiency",
        col("useful_tokens").cast("double") / col("slot_tokens"))
  }
}
