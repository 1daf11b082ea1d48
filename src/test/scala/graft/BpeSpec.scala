package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** BPE vocabulary learning: hand-computed merges on the classic corpus,
  * tie-break determinism, segmentation, partition invariance.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // Sennrich-style toy corpus: low:5 lower:2 newest:6 widest:3
  private def corpus = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)).toDF("word", "cnt")

  test("merge sequence matches the hand computation, ties break lexicographically") {
    val got = Bpe.learnMerges(corpus, "word", "cnt", 6)
      .map(m => (m.step, m.lhs, m.rhs, m.merged, m.cnt))
    val want = Seq(
      (1, "e", "s", "es", 9L),      // es/st tie at 9 -> 'e  s' < 's  t'
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),      // lo/ow tie at 7
      (4, "lo", "w", "low", 7L),
      (5, "e", "w", "ew", 6L),      // three-way tie at 6
      (6, "ew", "est", "ewest", 6L))
    assert(got === want)
  }

  test("greedy non-overlapping merge: aaa merges once per round") {
    val df = Seq(("aaa", 1L)).toDF("word", "cnt")
    val ms = Bpe.learnMerges(df, "word", "cnt", 2)
    // pair frequency counts positions (a·a occurs twice in 'a a a') but the
    // replace applies greedily left-to-right, so round 1 yields 'aa a'
    assert(ms.map(m => (m.lhs, m.rhs, m.cnt)) === Seq(("a", "a", 2L), ("aa", "a", 1L)))
  }

  test("segment applies merges in learned order") {
    val merges = Bpe.learnMerges(corpus, "word", "cnt", 6)
    val seg = Bpe.segment(Seq(("lowest", 1L)).toDF("word", "cnt"), "word", merges)
      .select("tokens").as[Seq[String]].head()
    assert(seg === Seq("low", "est"))
    // tokens always reassemble the word
    val all = Bpe.segment(corpus, "word", merges)
      .select("word", "tokens").as[(String, Seq[String])].collect()
    assert(all.forall { case (w, ts) => ts.mkString === w })
  }

  test("wordCounts: lowercased, ascii-only, whitespace framed") {
    val docs = Seq("The low LOW low!", "newest\tnewest  Widest", "123 été")
      .toDF("text")
    val wc = Bpe.wordCounts(docs, "text").as[(String, Long)].collect().toMap
    assert(wc === Map("the" -> 1L, "low" -> 2L, "newest" -> 2L, "widest" -> 1L))
  }

  test("partition invariance: merges identical at 1 and 7 partitions") {
    val a = Bpe.learnMerges(corpus.repartition(1), "word", "cnt", 4)
    val b = Bpe.learnMerges(corpus.repartition(7), "word", "cnt", 4)
    assert(a === b)
  }

  test("hybrid: driver path and distributed path produce identical merge tables") {
    // force the distributed path with threshold 0; default takes the driver path
    val viaDriver = Bpe.learnMerges(corpus, "word", "cnt", 6)
    val viaCluster = Bpe.learnMerges(corpus, "word", "cnt", 6, driverThreshold = 0L)
    assert(viaDriver === viaCluster)
    // and on a messier corpus with deep ties
    val docs = Seq("aba abba abab baba", "bb aa ab ba abba abab").toDF("text")
    val wc = Bpe.wordCounts(docs, "text")
    assert(Bpe.learnMerges(wc, "word", "cnt", 5) ===
      Bpe.learnMerges(wc, "word", "cnt", 5, driverThreshold = 0L))
  }

  test("vocabCoverage: hand-computed curve, rank ties by word") {
    // occurrences: a:4 b:3 c:1 d:1 → total 9, distinct 4; tie c<d by word
    val docs = Seq("a a a b b c", "a b d").toDF("text")
    val got = graft.text.TextOps.vocabCoverage(docs, "text", Seq(1, 2, 3, 4))
      .orderBy("vocab_size").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got === Array(
      (1, 1L, 4L, 9L, 4L, 4.0 / 9),
      (2, 2L, 7L, 9L, 4L, 7.0 / 9),
      (3, 3L, 8L, 9L, 4L, 8.0 / 9),   // c (not d) is rank 3
      (4, 4L, 9L, 9L, 4L, 1.0)))
  }
}
