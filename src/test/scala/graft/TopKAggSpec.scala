package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TopKAgg

/** The map-side-combined margin-top-k aggregate must keep EXACTLY the
  * set the round-12 windowed near-tie filter kept — the contract
  * [[graft.sim.Similarity]]'s double-prefilter correctness rests on.
  */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def viaAgg(df: DataFrame, k: Int, margin: Double): Set[(Long, Long)] =
    df.groupBy("q")
      .agg(TopKAgg.topK(col("s"), col("n"), k, margin).as("t"))
      .select(col("q"), explode(col("t")).as("x"))
      .select(col("q"), col("x._2").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def viaWindow(df: DataFrame, k: Int, margin: Double): Set[(Long, Long)] = {
    val w = Window.partitionBy("q")
    df.withColumn("rnk",
        row_number().over(w.orderBy(col("s").desc, col("n"))))
      .withColumn("kth", coalesce(
        max(when(col("rnk") === k, col("s"))).over(w), lit(-2.0)))
      .filter(col("s") >= col("kth") - margin)
      .select("q", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("hand-computed: ties at the boundary, margin near-ties, short groups") {
    // q=1 sorted: (0.9,10)(0.9,11)(0.8,12)(0.8-5e-10,13)(0.1,14) — at
    // k=3 the k-th score is 0.8, so id 13 (within 1e-9) survives and 14
    // does not; q=2 has fewer than k rows and keeps everything.
    val df = Seq(
      (1L, 0.9, 10L), (1L, 0.9, 11L), (1L, 0.8, 12L),
      (1L, 0.8 - 5e-10, 13L), (1L, 0.1, 14L),
      (2L, 0.5, 20L))
      .toDF("q", "s", "n")
    val got = viaAgg(df, 3, 1e-9)
    assert(got === Set((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (2L, 20L)))
    assert(got === viaWindow(df, 3, 1e-9))
  }

  test("matches the windowed form on a hashed frame, invariant under repartition") {
    val df = spark.range(500).select(
      (col("id") % 7).as("q"),
      (pmod(xxhash64(col("id")), lit(40)).cast("double") / 40.0).as("s"),
      col("id").as("n"))
    // ties are dense (40 distinct scores over ~71 rows per group), so
    // the boundary tie-break path is exercised hard
    for (margin <- Seq(0.0, 1e-9); k <- Seq(1, 5, 100)) {
      val want = viaWindow(df, k, margin)
      assert(viaAgg(df, k, margin) === want, s"k=$k margin=$margin")
      assert(viaAgg(df.repartition(13), k, margin) === want,
        s"k=$k margin=$margin under repartition (merge path)")
    }
  }

  test("globalTopKByScore: combiner path equals the window path, fallback for non-long ids") {
    import graft.ops.TopK
    val df = spark.range(300).select(
      col("id").as("n"),
      (pmod(xxhash64(col("id")), lit(40)).cast("double") / 40.0).as("s"),
      concat(lit("x"), col("id")).as("tag"))
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Double, String, Long)] =
      d.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3))).toSet
    val agg = TopK.globalTopKByScore(df, "s", "n", 7, rankCol = "rank")
    assert(agg.columns.toSeq === Seq("n", "s", "tag", "rank"))
    val win = TopK.topKPerKey(df, Seq.empty,
      Seq(col("s").desc, col("n").asc), 7, rankCol = "rank")
    assert(rows(agg) === rows(win),
      "combiner ranks + re-attached columns must equal the window form")
    // non-long id: the fallback IS the window form — same 7 winners
    val dfs = df.select(concat(lit("k"), col("n")).as("sid"), col("s"))
    val fb = TopK.globalTopKByScore(dfs, "s", "sid", 7, rankCol = "rank")
    assert(fb.count() === 7)
  }

  test("NaN scores rank first and survive, matching Spark's sort semantics") {
    val df = Seq(
      (1L, Double.NaN, 1L), (1L, 0.9, 2L), (1L, 0.8, 3L), (1L, 0.7, 4L))
      .toDF("q", "s", "n")
    val got = viaAgg(df, 2, 1e-9)
    assert(got === Set((1L, 1L), (1L, 2L)),
      "NaN is Spark's largest double and must hold rank 1")
    assert(got === viaWindow(df, 2, 1e-9))
  }

  test("the aggregate maintains a streaming top-k equal to the batch form") {
    // the KmvAgg claim applied to ranking: a mergeable buffer is the
    // form Structured Streaming can maintain incrementally — the same
    // code runs as an update/complete-mode groupBy aggregation (a
    // running "best documents seen so far" leaderboard), which no
    // window-rank form can do at all (rank windows are unsupported on
    // streams)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, Long)]
    val q = input.toDF().toDF("q", "s", "n")
      .groupBy("q")
      .agg(TopKAgg.topK(col("s"), col("n"), 3).as("t"))
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete").start()
    try {
      input.addData((1L, 0.5, 1L), (1L, 0.9, 2L), (2L, 0.3, 3L))
      q.processAllAvailable()
      input.addData((1L, 0.7, 4L), (1L, 0.95, 5L), (1L, 0.1, 6L))
      q.processAllAvailable()
      val streamed = spark.table("topk_stream")
        .select(col("q"), explode(col("t")).as("x"))
        .select(col("q"), col("x._2").as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Seq((1L, 0.5, 1L), (1L, 0.9, 2L), (2L, 0.3, 3L),
          (1L, 0.7, 4L), (1L, 0.95, 5L), (1L, 0.1, 6L))
        .toDF("q", "s", "n")
      assert(streamed === viaAgg(batch, 3, 0.0),
        "running streamed top-k must equal the batch aggregate over everything seen")
      assert(streamed === Set((1L, 5L), (1L, 2L), (1L, 4L), (2L, 3L)))
    } finally q.stop()
  }

  test("marginSurvivors: windowed fallback = combiner branch on tie-dense and NaN frames (ADVICE r13)") {
    // the Similarity prefilter's two branches must retain the SAME
    // survivor set: the retained set {rank<=k} ∪ {score >= kth-margin}
    // depends only on SCORES (ids break ties among equal scores, which
    // cannot change the k-th VALUE), so the long-id combiner branch and
    // the non-long-id windowed branch are set-equal even on tie-dense
    // frames — including NaN scores, where Spark's NaN-largest /
    // NaN-equals-itself semantics must hold in both. Deterministic
    // pseudo-random frames with heavy ties via a coarse score grid.
    def frame(seed: Int, rows: Int, grid: Int) = {
      val rnd = new scala.util.Random(seed)
      val data = (0 until rows).map { i =>
        val s = if (rnd.nextInt(20) == 0) Double.NaN
                else rnd.nextInt(grid).toDouble / grid
        (rnd.nextInt(3).toLong, i.toLong, s)
      }
      data.toDF("query_id", "neighbor_id", "dcos")
    }
    for (seed <- 1 to 5; k <- Seq(1, 3, 7)) {
      val df = frame(seed, 120, 6) // 6-value grid => dense ties
      val viaCombiner = graft.sim.Similarity.marginSurvivors(df, k)
        .collect().map(r => (r.getLong(0), r.getLong(1).toString)).toSet
      val viaWindowBranch = graft.sim.Similarity.marginSurvivors(
          df.select(col("query_id"),
            col("neighbor_id").cast("string").as("neighbor_id"), col("dcos")), k)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(viaWindowBranch === viaCombiner,
        s"branch mismatch at seed=$seed k=$k")
      // and null scores drop in both branches
      val withNull = df.unionByName(Seq((0L, 9999L, null.asInstanceOf[java.lang.Double]))
        .toDF("query_id", "neighbor_id", "dcos"))
      val g = graft.sim.Similarity.marginSurvivors(withNull, k)
        .collect().map(r => (r.getLong(0), r.getLong(1).toString)).toSet
      assert(g === viaCombiner, s"null score leaked at seed=$seed k=$k")
    }
  }
}
