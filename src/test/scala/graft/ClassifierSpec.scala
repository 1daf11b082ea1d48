package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Classifier

/** Hand-computed add-one NB quality classification (the q199 GPT-3
  * curation stage).
  */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def grid(p: Double): Double = math.round(p * 1.0e12).toDouble

  // train = docs 1,2 (doc1 pos, doc2 neg). Token occurrences:
  // pos a:2 b:1; neg b:1 c:1  ->  stats a(2,0) b(1,1) c(0,1);
  // n_pos=3, n_neg=2, V=3.
  // r(t) = (c_pos+1)(n_neg+V) / [(c_pos+1)(n_neg+V) + (c_neg+1)(n_pos+V)]
  // r(a)=15/21, r(b)=10/22, r(c)=5/17, r(z unseen)=5/11.
  private val docs = Seq(
    (1L, "a b a", true), (2L, "b c", false),
    (3L, "a c z", false), (4L, "x9 !!", false))
    .toDF("doc_id", "text", "pos")
  private val ra = 15.0 / 21.0; private val rb = 10.0 / 22.0
  private val rc = 5.0 / 17.0;  private val rz = 5.0 / 11.0

  test("hand-computed class counts, smoothing, unseen, alpha-free doc") {
    val got = Classifier.nbQualityWithTrain(docs, "doc_id", "text",
        isTrain = col("doc_id") <= 2, isPos = col("pos"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    val want = Array(
      (1L, 3L, 0L, (grid(ra) * 2 + grid(rb)) / 1.0e12 / 3.0, true),
      (2L, 2L, 0L, (grid(rb) + grid(rc)) / 1.0e12 / 2.0, false),
      (3L, 3L, 1L, (grid(ra) + grid(rc) + grid(rz)) / 1.0e12 / 3.0, false),
      (4L, 0L, 0L, 0.5, true))
    assert(got === want)
  }

  test("model artifact round-trip: save, load, score == in-session scorer") {
    val isTrain = col("doc_id") <= 2
    val want = Classifier.nbQualityWithTrain(docs, "doc_id", "text",
        isTrain, col("pos"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    try {
      Classifier.saveNbModel(
        Classifier.trainNbModel(docs, "doc_id", "text", isTrain, col("pos")),
        dir)
      val got = Classifier.scoreWithNbModel(docs, "doc_id", "text",
          Classifier.loadNbModel(spark, dir))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(4)))
      assert(got === want,
        "a reloaded model must score bit-identically to the training session")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("empty train partition degenerates to the neutral 0.5 everywhere") {
    val got = Classifier.nbQualityWithTrain(docs, "doc_id", "text",
        isTrain = lit(false), isPos = col("pos"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    // V=0 guard pins every posterior to 1/(1+1) = 0.5; the alpha-free
    // doc gets the same neutral via the empty-doc branch
    assert(got === Array((1L, 0.5), (2L, 0.5), (3L, 0.5), (4L, 0.5)))
  }

  test("salted wrapper: every doc labeled, invariant under repartition") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
    val isPos = col("source").isin("src0", "src1", "src2")
    def run(df: org.apache.spark.sql.DataFrame) =
      Classifier.nbQuality(df, "doc_id", "text", isPos)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getDouble(5)))
    val a = run(d)
    assert(a.length === d.count())
    assert(a.map(_._2).toSet === Set("train", "held"))
    assert(a.map(_._3).toSet === Set("ref", "other"))
    // train docs' own tokens are in the vocabulary by construction
    assert(a.filter(_._2 == "train").forall(_._5 == 0L))
    assert(run(d.repartition(7)) === a,
      "grid sums must make the score partition-invariant")
  }

  test("salted wrapper is one corpus scan: no re-attach file scan after the pin") {
    // the LangModel invariant carried over: split and class labels ride
    // the pinned occurrence stream's threaded flags, never a second
    // `documents` scan + join — the corpus is read exactly once while
    // building the pin, so the FINAL plan contains no file scan at all
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
    val df = Classifier.nbQuality(d, "doc_id", "text",
      col("source").isin("src0", "src1", "src2"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan") && !plan.contains("BatchScan"),
      s"classifier output plan re-reads the corpus:\n$plan")
  }

  test("paretoAccept: deterministic replayable keep rule at alpha = 1") {
    val scored = Classifier.nbQuality(docs, "doc_id", "text", col("pos"),
      trainFrac = 1.0, salt = "#t")
    val got = Classifier.paretoAccept(scored, "doc_id", "score", salt = "#a")
      .select("doc_id", "score", "keep").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    // replay the rule by hand from the same salted hash
    val want = got.map { case (id, s, _) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#a".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16)
        .toDouble + 9.223372036854776e18) / 1.8446744073709552e19
      (id, s, (1.0 / u - 1.0) > (1.0 - s))
    }
    assert(got === want)
  }
}
