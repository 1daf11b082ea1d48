package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layout

/** Morton-code bit math (hand-computed), the skipping property z-order
  * exists for (both dimensions' per-file ranges tighten vs a lexicographic
  * sort), and the write path's plan shape (range exchange, no global
  * single-partition sort).
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def mortonRef(a: Int, b: Int): Long =
    (0 until 16).map(i =>
      (((a.toLong >> i) & 1L) << (2 * i)) | (((b.toLong >> i) & 1L) << (2 * i + 1))
    ).reduce(_ | _)

  test("morton16 matches the reference interleave on hand cases + random grid") {
    val cases = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (1234, 4321))
    val df = cases.toDF("a", "b")
      .withColumn("z", Layout.morton16(col("a"), col("b")))
    df.collect().foreach { r =>
      assert(r.getLong(2) === mortonRef(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)}, ${r.getInt(1)})")
    }
    assert(mortonRef(1, 0) === 1L && mortonRef(0, 1) === 2L &&
      mortonRef(3, 5) === 39L) // 3=11b, 5=101b -> z=100111b
    val rnd = new scala.util.Random(3)
    val rc = Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val got = rc.toDF("a", "b")
      .select(Layout.morton16(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq === rc.map { case (a, b) => mortonRef(a, b) })
  }

  test("z-order tightens BOTH dims' per-file ranges vs lexicographic sort") {
    // 64x64 grid, one row per cell; 16 files. Lexicographic by (a, b)
    // gives each file the full b-range; z-order bounds both ranges.
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b)).toDF("a", "b")
    def spread(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val parts = df.withColumn("p", spark_partition_id())
        .groupBy("p").agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
        .agg(avg("ra"), avg("rb")).head()
      (parts.getDouble(0), parts.getDouble(1))
    }
    val lex = spread(grid.repartitionByRange(16, col("a"), col("b")))
    val zed = spread(Layout.zorderBy(grid, col("a"), col("b"), 16))
    assert(lex._2 === 63.0)          // lexicographic: full b-range everywhere
    assert(zed._1 <= 32.0 && zed._2 <= 32.0, s"z spread $zed")
  }

  test("zorderBy plans a range exchange, not a single-partition global sort") {
    val df = (1 to 1000).map(i => (i % 37, i % 53)).toDF("a", "b")
    val plan = Layout.zorderBy(df, col("a"), col("b"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("REPARTITION_BY_NUM"),
      s"plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
  }
}
