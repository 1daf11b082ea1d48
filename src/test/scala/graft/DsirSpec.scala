package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Dsir

/** DSIR-style importance weighting: gram/mass invariants, selection
  * determinism, broadcast profile join, partition invariance.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "the dog ate the cat food", "en"),
    (3L, "le chat mange", "fr"),
    (4L, "der hund und die katze", "de"),
    (5L, "cat cat cat", "fr"),
    (6L, "12345 !!!", "de"), // no ascii-word grams
    (7L, "", "fr")).toDF("doc_id", "text", "lang")

  test("gram counts: n unigrams + (n-1) bigrams; masses smoothed; weight <= 1") {
    val w = Dsir.importanceWeights(docs, "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id").collect()
    val byId = w.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) === 6 + 5) // 6 tokens -> 6 uni + 5 bi
    assert(byId(5L).getLong(1) === 3 + 2)
    assert(byId(6L).getLong(1) === 0 && byId(6L).getDouble(4) === 0.0)
    assert(byId(7L).getLong(1) === 0)
    // every bucket's target count <= raw count, so t_mass <= r_mass
    w.filter(_.getLong(1) > 0).foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))
      assert(r.getDouble(4) === r.getLong(2).toDouble / r.getLong(3).toDouble)
      // add-one smoothing: each gram contributes >= 1 to t_mass, >= 2 to r_mass
      assert(r.getLong(2) >= r.getLong(1) && r.getLong(3) >= 2 * r.getLong(1))
    }
    // a doc whose grams live only in the target outranks a
    // disjoint-vocabulary doc (whose every bucket has t_cnt = 0); note
    // corpus-COMMON grams are correctly downweighted (raw count in the
    // denominator), so sheer overlap with the pool doesn't score
    assert(byId(1L).getDouble(4) > byId(4L).getDouble(4),
      "target-vocabulary doc must outrank disjoint-vocabulary doc")
  }

  test("select: top-k with rank 1..k, weight desc, id tiebreak; two-stage plan") {
    val w = Dsir.importanceWeights(docs, "doc_id", "text", col("lang") === "en")
    val raw = w.join(docs.select("doc_id", "lang"), "doc_id")
      .filter(col("lang") =!= "en").drop("lang")
    val sel = Dsir.select(raw, "doc_id", 3).orderBy("rank").collect()
    assert(sel.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    val ws = sel.map(_.getAs[Double]("weight")).toSeq
    assert(ws === ws.sorted.reverse)
  }

  test("profile join broadcasts the bounded bucket frame") {
    val w = Dsir.importanceWeights(docs, "doc_id", "text", col("lang") === "en",
      buckets = 64)
    val plan = w.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"profile should broadcast, got:\n$plan")
  }

  test("partition invariance") {
    val a = Dsir.importanceWeights(docs.repartition(1), "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Dsir.importanceWeights(docs.repartition(5), "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
