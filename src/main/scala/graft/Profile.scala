package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling / plan-audit main (not part of the driver contract).
  * Round 14: IVF wall decomposition — quantizer train vs candidate join
  * vs re-rank — and the packed-PQ pair-scan cost.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.sim.Similarity
    val dim = 64
    def emb = graft.tools.ScaleStress.annEmbeddings(spark, n, dim)
    def qs = graft.tools.ScaleStress.annEmbeddings(spark, 64L, dim)
    // warmup (the cold-first JIT trap)
    Similarity.ivfTopK(graft.tools.ScaleStress.annEmbeddings(spark, 20000L, dim),
      graft.tools.ScaleStress.annEmbeddings(spark, 8L, dim),
      "vec_id", "embedding", 10, nCells = 64, nProbe = 8).count()
    // KMeans train alone (the ivfAssign internals, replicated)
    time("kmeans train only") {
      import org.apache.spark.ml.clustering.KMeans
      val corpusF = emb.select(col("vec_id").as("neighbor_id"),
        org.apache.spark.ml.functions.array_to_vector(
          col("embedding").cast("array<double>")).as("__f"))
      val sampled = corpusF.sample(withReplacement = false, 0.25, 42L)
      val trainDf = if (sampled.count() >= 128L) sampled else corpusF
      new KMeans().setK(64).setSeed(42L).setMaxIter(10)
        .setInitMode("random")
        .setFeaturesCol("__f").setPredictionCol("__cell").fit(trainDf)
    }
    time("ivfCandidates (train+probe)") {
      Similarity.ivfCandidates(emb, qs, "vec_id", "embedding",
        nCells = 64, nProbe = 8).count()
    }
    time("ivfTopK full") {
      Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 10,
        nCells = 64, nProbe = 8).count()
    }
    spark.stop()
  }
}
