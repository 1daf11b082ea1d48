package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Shard

/** The rendezvous property (the whole point vs pmod): removing the last
  * shard moves ONLY that shard's keys; plus balance and determinism.
  */
class ShardSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("shrinking the shard set reassigns only the removed shard's keys") {
    val keys = (1 to 4000).map(_.toLong).toDF("k")
    val both = keys.select(col("k"),
        Shard.rendezvous(col("k"), 8).as("s8"),
        Shard.rendezvous(col("k"), 7).as("s7"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val moved = both.filter { case (_, s8, s7) => s8 != s7 }
    assert(moved.nonEmpty)
    moved.foreach { case (k, s8, _) =>
      assert(s8 === 7L, s"key $k moved but was not on the removed shard")
    }
    // pmod, by contrast, moves most keys on the same change
    val pmodMoved = both.count { case (k, _, _) => k % 8 != k % 7 }
    assert(pmodMoved > both.length / 2)
  }

  test("assignment balances within ~3x sqrt and is deterministic") {
    val keys = (1 to 8000).map(i => s"doc$i").toDF("k")
    val counts = keys.select(Shard.rendezvous(col("k"), 16).as("s"))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0L until 16L).toSet)
    val mean = 8000.0 / 16
    counts.values.foreach(c => assert(math.abs(c - mean) < 3 * math.sqrt(mean) + 10,
      s"counts $counts"))
    val again = keys.repartition(9)
      .select(Shard.rendezvous(col("k"), 16).as("s"))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === counts)
  }
}
