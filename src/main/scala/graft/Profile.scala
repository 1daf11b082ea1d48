package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling / plan-audit main (not part of the driver contract).
  * Round 14: pqTopK fast-path scaling check (unpinned packed codes).
  */
object Profile {
  def main(args: Array[String]): Unit = {
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
    def emb(n: Long) = graft.tools.ScaleStress.annEmbeddings(spark, n, dim)
    def qs = graft.tools.ScaleStress.annEmbeddings(spark, 64L, dim)
    for (n <- Seq(20000L, 20000L, 50000L, 100000L, 200000L)) {
      time(s"pqTopK fast n=$n") {
        Similarity.pqTopK(emb(n), qs, "vec_id", "embedding", m, k, dim, 10,
          exactEncode = false).count()
      }
    }
    spark.stop()
  }
}
