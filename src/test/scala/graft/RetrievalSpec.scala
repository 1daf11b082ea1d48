package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Retrieval

/** BM25 retrieval (rational idf): hand-computed score, ranking
  * sanity, tie-breaks, repartition stability.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "hash join hash join hash"),  // tf(hash)=3, dl=5
    (2L, "hash table scan"),           // tf(hash)=1, dl=3
    (3L, "sort merge join"),           // tf(hash)=0
    (4L, "scan scan scan scan")).toDF("doc_id", "text")

  test("score matches the closed form on a hand-checked corpus") {
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("hash"), topK = 4)
      .orderBy("rank").collect()
    // N=4, df=2, sumdl=15, avgdl=3.75; idf=(4-2+0.5)/(2+0.5)=1.0
    val avgdl = 15.0 / 4
    def comp(tf: Long, dl: Long): Double = {
      val idf = ((4 - 2).toDouble + 0.5) / (2.0 + 0.5)
      idf * (tf.toDouble * 2.2) / (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))
    }
    assert(got(0).getLong(0) === 1L)
    assert(got(0).getAs[Double]("score") === comp(3, 5))
    assert(got(1).getLong(0) === 2L)
    assert(got(1).getAs[Double]("score") === comp(1, 3))
    // zero-tf docs score exactly 0.0 and tie-break on id
    assert(got(2).getLong(0) === 3L && got(2).getAs[Double]("score") === 0.0)
    assert(got(3).getLong(0) === 4L && got(3).getAs[Double]("score") === 0.0)
  }

  test("multi-term score is the fixed-order sum of components; topK bounds rows") {
    val r = Retrieval.bm25(docs, "doc_id", "text", Seq("hash", "join"), topK = 2)
      .orderBy("rank").collect()
    assert(r.length === 2)
    assert(r.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
    assert(r(0).getAs[Double]("score") > r(1).getAs[Double]("score"))
  }

  test("repartition-stable") {
    val a = Retrieval.bm25(docs.repartition(1), "doc_id", "text",
      Seq("hash", "join"), topK = 4).orderBy("rank").collect().map(_.toSeq).toSeq
    val b = Retrieval.bm25(docs.repartition(5), "doc_id", "text",
      Seq("hash", "join"), topK = 4).orderBy("rank").collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
