package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Mixing

/** Deterministic mixture-weighted interleave: prefix-ratio guarantee,
  * repartition stability, exclusion contract, no-window plan.
  */
class MixingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def docs(n: Int) = (0 until n).map { i =>
    (i.toLong, if (i % 10 < 6) "a" else if (i % 10 < 9) "b" else "c")
  }.toDF("id", "grp")

  test("every prefix holds each group within one doc of its stride ideal") {
    val w = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val mixed = Mixing.interleave(docs(200), "grp", "id", w)
      .orderBy("mix_pos").select("grp", "mix_key").collect()
    // stride guarantee: the prefix up to key T holds floor(T*w + 0.5)
    // docs of each group — check at every position via the actual key
    val sizes = mixed.groupBy(_.getString(0)).map { case (g, rs) => g -> rs.length }
    val counts = scala.collection.mutable.Map.empty[String, Int]
    mixed.foreach { r =>
      val g = r.getString(0); val t = r.getDouble(1)
      counts(g) = counts.getOrElse(g, 0) + 1
      w.foreach { case (grp, wt) =>
        // the stride ideal holds until the group's supply is exhausted
        val ideal = math.min(t * wt, sizes(grp).toDouble)
        val got = counts.getOrElse(grp, 0).toDouble
        assert(math.abs(got - ideal) <= 1.0 + 1e-9,
          s"group $grp at key $t: got $got, ideal $ideal")
      }
    }
  }

  test("deterministic under repartitioning; groups outside the mixture are dropped") {
    val w = Map("a" -> 0.6, "b" -> 0.4) // 'c' excluded
    val base = docs(100)
    val m1 = Mixing.interleave(base.repartition(1), "grp", "id", w)
      .orderBy("mix_pos").collect().map(_.getAs[Long]("id")).toSeq
    val m2 = Mixing.interleave(base.repartition(7), "grp", "id", w)
      .orderBy("mix_pos").collect().map(_.getAs[Long]("id")).toSeq
    assert(m1 === m2)
    assert(m1.length === 90, "the 10 'c' docs are excluded by contract")
    // mix positions are a dense 1..n permutation
    val pos = Mixing.interleave(base, "grp", "id", w)
      .select("mix_pos").collect().map(_.getLong(0)).sorted.toSeq
    assert(pos === (1L to 90L).toSeq)
  }

  test("plan has no window operator (zipWithIndex scheme only)") {
    val m = Mixing.interleave(docs(50), "grp", "id", Map("a" -> 0.7, "b" -> 0.3))
    val plan = m.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no WindowExec, got:\n$plan")
  }

  test("epochShuffle: dense permutation, epoch-independent, layout-proof") {
    val d = docs(120).select("id")
    val e0 = Mixing.epochShuffle(d, "id", 0L).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).sortBy(_._1)
    // positions are exactly 0..n-1 and every id appears once
    assert(e0.map(_._1).toSeq === (0L until 120L))
    assert(e0.map(_._2).distinct.length === 120)
    // a different epoch is a different permutation of the same ids
    val e1 = Mixing.epochShuffle(d, "id", 1L).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).sortBy(_._1)
    assert(e1.map(_._2).sorted.toSeq === e0.map(_._2).sorted.toSeq)
    assert(e1.map(_._2).toSeq !== e0.map(_._2).toSeq)
    // the order is a function of (corpus, epoch), not of the layout
    val relaid = Mixing.epochShuffle(
      d.repartition(7).sortWithinPartitions(col("id").desc), "id", 0L)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).sortBy(_._1)
    assert(relaid.toSeq === e0.toSeq)
    // no window operator anywhere in the plan
    val plan = Mixing.epochShuffle(d, "id", 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no WindowExec, got:\n$plan")
  }
}
