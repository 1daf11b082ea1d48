package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native serving prefilter aggregate must be indistinguishable
  * from the typed-udaf reference ([[graft.ops.VecTopKAgg]]) — same
  * retention set, same order, same payloads — across margin settings,
  * tie-dense scores, duplicate re-presentations, null scores, and
  * partitioning (the map-side combine exercises merge()).
  */
class VecTopKNativeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def nativeTopK(k: Int, margin: Double) =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.VecTopKNative(
        org.apache.spark.sql.graft.Bridge.expression(col("s")),
        org.apache.spark.sql.graft.Bridge.expression(col("id")),
        org.apache.spark.sql.graft.Bridge.expression(col("v")),
        k, margin).toAggregateExpression())

  // deterministic frame: hash-derived scores with planted exact ties,
  // duplicates (the LSH multi-table re-presentation), and a null score
  private def frame(n: Int) = {
    val rows = (0 until n).flatMap { i =>
      val g = i % 5
      val s = ((i * 37) % 19).toDouble / 19.0
      val base = Seq((g.toLong, s, i.toLong,
        Seq(i.toDouble, (i * 2).toDouble)))
      if (i % 7 == 0) base ++ base else base // exact duplicates
    } :+ ((0L, Double.NaN, 9999L, Seq(1.0, 2.0)))
    rows.toDF("g", "s", "id", "v")
      .withColumn("s", when(col("id") === 17L, lit(null)).otherwise(col("s")))
      .withColumn("v", col("v").cast("array<double>"))
  }

  test("native ≡ udaf across k, margin, ties, duplicates, partitioning") {
    for (k <- Seq(1, 3, 10); margin <- Seq(0.0, 0.05); parts <- Seq(1, 7)) {
      val df = frame(120).repartition(parts)
      val udafRes = df.filter(col("s").isNotNull)
        .groupBy("g")
        .agg(graft.ops.VecTopKAgg.topK(col("s"), col("id"), col("v"),
          k, margin).as("top"))
        .orderBy("g").collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getDouble(0), x.getLong(1), x.getSeq[Double](2).toList)))
      val natRes = df
        .groupBy("g")
        .agg(nativeTopK(k, margin).as("top"))
        .orderBy("g").collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getDouble(0), x.getLong(1), x.getSeq[Double](2).toList)))
      // NaN-containing tuples compare by toString (NaN != NaN in ==)
      assert(natRes.map(_.toString).toSeq === udafRes.map(_.toString).toSeq,
        s"mismatch at k=$k margin=$margin parts=$parts")
    }
  }

  test("null scores are dropped, not propagated") {
    val df = Seq((0L, Option.empty[Double], 1L, Seq(1.0)),
      (0L, Some(0.5), 2L, Seq(2.0))).toDF("g", "s", "id", "v")
      .withColumn("v", col("v").cast("array<double>"))
    val got = df.groupBy("g").agg(nativeTopK(5, 0.0).as("top"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](1)
    assert(got.map(_.getLong(1)) === Seq(2L))
  }
}
