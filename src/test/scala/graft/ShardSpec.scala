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

  test("shardManifest: checksum is order-free and maintains incrementally") {
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    def manifest(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      Shard.shardManifest(df, "doc_id", "text", 4).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    val v1 = (1L to 60L).map(i => (i, s"base document number $i with words"))
    val add = (61L to 75L).map(i => (i, s"appended crawl doc $i"))
    val m1 = manifest(docs(v1))
    val mAdd = manifest(docs(add))
    val mAll = manifest(docs(v1 ++ add))
    // partitioning/row-order invariance: shuffled input, same manifest
    assert(manifest(docs(scala.util.Random.shuffle(v1 ++ add)).repartition(7))
      === mAll)
    // merge law: v2 checksum = v1 checksum + appended checksum per shard
    // (Java long addition wraps mod 2^64 exactly like the operator)
    (0L until 4L).foreach { s =>
      val (n1, c1) = m1.getOrElse(s, (0L, 0L))
      val (na, ca) = mAdd.getOrElse(s, (0L, 0L))
      val (nAll, cAll) = mAll.getOrElse(s, (0L, 0L))
      assert(nAll === n1 + na, s"shard $s doc count not additive")
      assert(cAll === c1 + ca, s"shard $s checksum not additive")
    }
    // takedown: removing the appended docs subtracts their contribution
    (0L until 4L).foreach { s =>
      val (_, cAll) = mAll.getOrElse(s, (0L, 0L))
      val (_, ca) = mAdd.getOrElse(s, (0L, 0L))
      assert(m1.getOrElse(s, (0L, 0L))._2 === cAll - ca)
    }
  }
}
