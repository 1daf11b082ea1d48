package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.LangModel

/** Hand-computed add-one bigram-LM fluency (the q195 CCNet stage). */
class LangModelSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def grid(p: Double): Double = math.round(p * 1.0e12).toDouble

  test("bigram fluency: hand-computed counts, smoothing, unseen, empty doc") {
    // train = docs 1,2. Bigram occurrences: doc1 "a b","b a","a b";
    // doc2 "a b","b c"  ->  c(a b)=3, c(b a)=1, c(b c)=1;
    // contexts c(a)=3, c(b)=2; V = |{b, a, c}| = 3 (train successors).
    // p(a b)=(3+1)/(3+3)=4/6; p(b a)=p(b c)=2/5; p(b z)=(0+1)/(2+3)=1/5
    // (unseen). doc4 has one alpha token -> zero bigrams; "Z9" filtered.
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b c"), (3L, "a b z"), (4L, "x Z9"))
      .toDF("doc_id", "text")
    val got = LangModel.bigramFluencyWithTrain(docs, "doc_id", "text",
        isTrain = col("doc_id") <= 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val pab = grid(4.0 / 6.0); val pba = grid(2.0 / 5.0)
    val pbc = grid(2.0 / 5.0); val pbz = grid(1.0 / 5.0)
    assert(got === Array(
      (1L, 3L, 0L, (pab * 2 + pba) / 1.0e12 / 3.0),
      (2L, 2L, 0L, (pab + pbc) / 1.0e12 / 2.0),
      (3L, 2L, 1L, (pab + pbz) / 1.0e12 / 2.0),
      (4L, 0L, 0L, 0.0)))
  }

  test("model artifact round-trip: save, load, score == in-session scorer") {
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b c"), (3L, "a b z"), (4L, "x Z9"))
      .toDF("doc_id", "text")
    val isTrain = col("doc_id") <= 2
    val want = LangModel.bigramFluencyWithTrain(docs, "doc_id", "text", isTrain)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    try {
      LangModel.saveModel(
        LangModel.trainBigramModel(docs, "doc_id", "text", isTrain), dir)
      val got = LangModel.scoreWithModel(docs, "doc_id", "text",
          LangModel.loadModel(spark, dir))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got === want,
        "a reloaded model must score bit-identically to the training session")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("salted wrapper: every doc scored and labeled, invariant under repartition") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val a = LangModel.bigramFluency(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(a.length === docs.count())
    assert(a.map(_._2).toSet === Set("train", "held"),
      "both split labels must appear at sf0.001")
    // held-out docs can carry unseen bigrams; train docs can't (their
    // own occurrences are in the counts)
    assert(a.filter(_._2 == "train").forall(_._4 == 0L))
    val b = LangModel.bigramFluency(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(b === a, "grid sums must make the score partition-invariant")
  }

  test("trigram fluency: hand-computed counts over two-token contexts") {
    // train = docs 1,2. Trigram occurrences: doc1 "a b a","b a b","a b a";
    // doc2 "a b c"  ->  c(a b a)=2, c(b a b)=1, c(a b c)=1;
    // contexts c(a b)=3, c(b a)=1; V = |{a, b, c}| = 3 (train successors).
    // p(a b a)=(2+1)/(3+3)=1/2; p(b a b)=(1+1)/(1+3)=1/2;
    // p(a b c)=(1+1)/(3+3)=1/3; p(b a z)=(0+1)/(1+3)=1/4 (unseen).
    // doc4 has two alpha tokens -> zero trigrams.
    val docs = Seq(
      (1L, "a b a b a"), (2L, "a b c"), (3L, "a b a z"), (4L, "x y"))
      .toDF("doc_id", "text")
    val got = LangModel.ngramFluencyWithTrain(docs, "doc_id", "text",
        isTrain = col("doc_id") <= 2, n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val paba = grid(1.0 / 2.0); val pbab = grid(1.0 / 2.0)
    val pabc = grid(1.0 / 3.0); val pbaz = grid(1.0 / 4.0)
    assert(got === Array(
      (1L, 3L, 0L, (paba * 2 + pbab) / 1.0e12 / 3.0),
      (2L, 1L, 0L, pabc / 1.0e12 / 1.0),
      (3L, 2L, 1L, (paba + pbaz) / 1.0e12 / 2.0),
      (4L, 0L, 0L, 0.0)))
  }

  test("trigram model round-trip: order persists, reloaded score == in-session scorer") {
    val docs = Seq(
      (1L, "a b a b a"), (2L, "a b c"), (3L, "a b a z"), (4L, "x y"))
      .toDF("doc_id", "text")
    val isTrain = col("doc_id") <= 2
    val want = LangModel.ngramFluencyWithTrain(docs, "doc_id", "text",
        isTrain, n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val dir = java.nio.file.Files.createTempDirectory("graft-lm3").toString
    try {
      LangModel.saveModel(
        LangModel.trainNgramModel(docs, "doc_id", "text", isTrain, n = 3), dir)
      val m = LangModel.loadModel(spark, dir)
      assert(m.n === 3, "gram order must persist through save/load")
      val got = LangModel.scoreWithModel(docs, "doc_id", "text", m)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got === want,
        "a reloaded trigram model must score bit-identically to the training session")
      assert(LangModel.scoreWithModel(docs, "doc_id", "text", m)
        .columns.toSeq === Seq("doc_id", "n_ngrams", "n_unseen", "mean_cond_p"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("salted wrapper is one corpus scan: no re-attach file scan after the pin") {
    // VERDICT r12 item 3: the split label must ride the pinned
    // occurrence stream's threaded train flag, not a second `documents`
    // scan + join. The corpus is read exactly once — while building the
    // pinned occurrence RDD — so the FINAL plan must contain no file
    // scan at all (every leaf is a pinned/broadcast RDD or the 1-row V).
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val df = LangModel.bigramFluency(docs, "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan") && !plan.contains("BatchScan"),
      s"fluency output plan re-reads the corpus:\n$plan")
  }
}
