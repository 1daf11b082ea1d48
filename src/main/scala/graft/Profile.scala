package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling / plan-audit main (not part of the driver contract).
  * Round 14: pqTopK fast-path materialization A/B (pin vs exchange).
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
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.sim.Similarity
    val dim = 64; val m = 8; val k = 16
    def emb(x: Long) = graft.tools.ScaleStress.annEmbeddings(spark, x, dim)
    def qs = graft.tools.ScaleStress.annEmbeddings(spark, 64L, dim)
    // warm
    Similarity.pqTopK(emb(20000L), qs, "vec_id", "embedding", m, k, dim, 10,
      exactEncode = false).count()
    time("pqTopK fast 100k") {
      Similarity.pqTopK(emb(100000L), qs, "vec_id", "embedding", m, k, dim, 10,
        exactEncode = false).count() }
    time("pqTopK fast 1M") {
      Similarity.pqTopK(emb(n), qs, "vec_id", "embedding", m, k, dim, 10,
        exactEncode = false).count() }
    time("pqTopK fast 1M 2nd") {
      Similarity.pqTopK(emb(n), qs, "vec_id", "embedding", m, k, dim, 10,
        exactEncode = false).count() }
    spark.stop()
  }
}
