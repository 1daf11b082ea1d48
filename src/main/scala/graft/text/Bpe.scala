package graft.text

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Pin

/** Byte-pair-encoding vocabulary learning — tokenizer *training* over a
  * corpus, the missing sibling of the token-counting ops in [[TextOps]].
  *
  * Standard BPE (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units"): start from characters, repeatedly
  * merge the most frequent adjacent symbol pair. The scale shape is the
  * classic one: ONE pass over the corpus builds the (word, count)
  * frame; every merge iteration then runs over the *distinct-word*
  * frame only — at web scale that is orders of magnitude smaller than
  * the corpus (and still distributed here: billions of distinct words
  * don't fit a driver). Driver state is just the merge table (k rows).
  *
  * Representation: a word's symbol sequence is its symbols joined by
  * TWO spaces, with two leading/trailing pad spaces. A merge of (a, b)
  * is then the literal replace of ` a  b ` with ` ab `: the one-space
  * margins keep symbol boundaries exact (no substring can match inside
  * a longer symbol), and because the pattern consumes only ONE space of
  * each double separator, left-to-right non-overlapping replace handles
  * consecutive occurrences (`a b a b` merges both) while staying greedy
  * on overlaps (`a a a` merges once) — the same semantics in Spark's
  * `replace` and DuckDB's, which is what makes the whole protocol
  * oracle-replayable (q116).
  *
  * Determinism: ties in pair frequency break on the pair string
  * ascending (ASCII corpus ⇒ identical collation in both engines).
  */
object Bpe {

  final case class Merge(step: Int, lhs: String, rhs: String, merged: String, cnt: Long)

  /** Lower-cased whitespace tokens restricted to `[a-z]+` (the ASCII
    * restriction keeps char-splitting identical across engines — Spark
    * splits UTF-16 code units, other engines codepoints; documented
    * demo scope, the operator itself has no such limit).
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  private def toSeqCol(word: Column): Column =
    concat(lit("  "), concat_ws("  ", split(word, "")), lit("  "))

  /** Learn `nMerges` BPE merges from a (word, count) frame.
    *
    * Hybrid, like `Dedup.dupGroups`: when the distinct-word frame is
    * small enough to collect (`driverThreshold`, default 200k words —
    * real-world tokenizer training corpora compress to a few million
    * distinct words, and production trainers run the merge loop
    * in-memory for exactly this reason), the merge loop runs on the
    * driver with the SAME representation and replace semantics, so both
    * paths produce identical tables; above the threshold each iteration
    * is a distributed pair-count job (map-side combined groupBy over
    * the distinct-word frame), deterministic argmax, literal replace,
    * with the evolving frame [[Pin]]ned per round so lineage stays
    * constant-depth. Either way the corpus itself is touched exactly
    * once (in [[wordCounts]]) — merges never rescan it.
    */
  def learnMerges(words: DataFrame, wordCol: String, cntCol: String,
                  nMerges: Int, driverThreshold: Long = 200000L): Seq[Merge] = {
    val counted = words.select(col(wordCol).as("word"), col(cntCol).cast("long").as("cnt"))
    val cached = counted.cache()
    try {
      if (cached.count() <= driverThreshold) {
        val local = cached.collect().map(r => (r.getString(0), r.getLong(1)))
        learnMergesLocal(local, nMerges)
      } else learnMergesDistributed(cached, nMerges)
    } finally cached.unpersist(blocking = true)
  }

  /** Driver merge loop — same two-space strings, same left-to-right
    * `String.replace`, same (count desc, pair asc) tie-break as the
    * distributed path: bit-identical output by construction.
    */
  private def learnMergesLocal(words: Array[(String, Long)], nMerges: Int): Seq[Merge] = {
    val out = ArrayBuffer.empty[Merge]
    var seqs = words.map { case (w, c) => ("  " + w.mkString("  ") + "  ", c) }
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      seqs.foreach { case (s, c) =>
        val syms = s.trim.split("  ")
        var i = 0
        while (i < syms.length - 1) {
          val p = syms(i) + "  " + syms(i + 1)
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, cnt) = counts.minBy { case (p, c) => (-c, p) }
        val Array(l, r) = pair.split("  ", 2)
        val merged = l + r
        out += Merge(step, l, r, merged, cnt)
        seqs = seqs.map { case (s, c) => (s.replace(s" $pair ", s" $merged "), c) }
        step += 1
      }
    }
    out.toSeq
  }

  private def learnMergesDistributed(words: DataFrame, nMerges: Int): Seq[Merge] = {
    val out = ArrayBuffer.empty[Merge]
    var cur = Pin.pin(words.select(
      toSeqCol(col("word")).as("seq"), col("cnt")))
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      // zip_with over slices, not element_at(arr, i) in an index lambda:
      // a non-lambda subexpression in a HOF body re-evaluates PER
      // ELEMENT, so the element_at form re-split the seq string
      // O(len²) times per word (the q195 lesson, LangModel.bigramArr).
      // The split array is additionally let-bound once per row (the
      // chunkWindows single-element-array trick): the pair tree
      // references it 5 times, and each textual reference analyzes
      // into a distinct binding CSE cannot unify — the unbound form
      // re-split 5 times per ROW (SCALE.md round 13).
      val pairsOf = flatten(transform(
        array(split(trim(col("seq")), "  ")), arr =>
          when(size(arr) >= 2,
            zip_with(slice(arr, lit(1), size(arr) - 1),
              slice(arr, lit(2), size(arr) - 1),
              (a, b) => concat(a, lit("  "), b)))
            .otherwise(array().cast("array<string>"))))
      val top = cur.select(explode(pairsOf).as("pair"), col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val Array(l, r) = pair.split("  ", 2)
        val merged = l + r
        out += Merge(step, l, r, merged, cnt)
        val next = Pin.pin(cur.withColumn("seq",
          expr(s"replace(seq, ' $pair ', ' $merged ')")))
        cur.unpersist(blocking = true)
        cur = next
        step += 1
      }
    }
    cur.unpersist(blocking = true)
    out.toSeq
  }

  /** Segment words with a learned merge table: replays the merges in
    * learned order (the standard apply rule) and returns the word's
    * subword tokens.
    */
  def segment(words: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame = {
    val seqd = merges.foldLeft(words.withColumn("_seq", toSeqCol(col(wordCol)))) {
      case (df, m) =>
        df.withColumn("_seq", expr(s"replace(_seq, ' ${m.lhs}  ${m.rhs} ', ' ${m.merged} ')"))
    }
    seqd.withColumn("tokens", split(trim(col("_seq")), "  ")).drop("_seq")
  }
}
