package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bloom

/** Bloom-pruned semi-join invariants: never a false negative (the prune
  * admits a superset of true matches), real pruning on disjoint keys,
  * exact equality with the plain semi join, determinism.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("mightContain: superset of members, prunes most non-members") {
    val dim = (1 to 500).map(i => s"k$i").toDF("key")
    val words = Bloom.filterWords(dim, "key", mBits = 1 << 16, k = 4)
    assert(words.length === (1 << 16) / 64)
    val probe = ((1 to 500).map(i => s"k$i") ++ (1 to 5000).map(i => s"x$i"))
      .toDF("key")
    val admitted = probe
      .filter(Bloom.mightContain(col("key"), words, 1 << 16, 4))
      .as[String].collect().toSet
    // every true member admitted
    (1 to 500).foreach(i => assert(admitted.contains(s"k$i")))
    // false-positive rate for m=64k bits, n=500, k=4 is ~(n*k/m)^k ~ 1e-6;
    // allow slack but require real pruning
    val fps = admitted.count(_.startsWith("x"))
    assert(fps <= 5, s"false positives: $fps")
  }

  test("bloomSemiJoin equals the plain semi join (long keys)") {
    val fact = (1 to 4000).map(i => (i.toLong % 700, i)).toDF("fk", "v")
    val dim = (0 until 120).map(i => (i * 5).toLong).toDF("dk")
    val plain = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val bloomed = Bloom.bloomSemiJoin(fact, dim, "fk", "dk", mBits = 1 << 12, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(bloomed === plain)
    assert(plain.nonEmpty)
  }

  test("filterWords deterministic under repartition") {
    val dim = (1 to 300).map(i => s"d$i").toDF("key")
    val a = Bloom.filterWords(dim, "key", 1 << 14, 4)
    val b = Bloom.filterWords(dim.repartition(11), "key", 1 << 14, 4)
    assert(a.toSeq === b.toSeq)
  }
}
