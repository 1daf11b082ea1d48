package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling / plan-audit main (not part of the driver contract).
  * Round 14: PQ ADC decomposition — where pqTopK's wall actually goes.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
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
    val dim = 64; val m = 8; val k = 16; val dsub = dim / m
    def emb = graft.tools.ScaleStress.annEmbeddings(spark, n, dim)
    def qs = graft.tools.ScaleStress.annEmbeddings(spark, 64L, dim)
    val cb = time("codebook") {
      Similarity.pqCodebook(emb, "vec_id", "embedding", m, k, dim) }
    val codes = Similarity.pqEncodeFast(emb, "vec_id", "embedding", cb, m, dim)
      .withColumnRenamed("vec_id", "neighbor_id")
    time("codes count") { codes.count() }
    time("codes count warm") { codes.count() }
    val qsubs = qs
      .select(col("vec_id").as("query_id"),
        explode(sequence(lit(0), lit(m - 1))).as("j"), col("embedding"))
      .withColumn("qsub", slice(col("embedding"), col("j") * dsub + 1, lit(dsub)))
      .drop("embedding")
    val table = qsubs.join(broadcast(cb), Seq("j"))
      .withColumn("td", Similarity.sqDistExact(col("qsub"), col("cvec")))
      .select("query_id", "j", "code", "td")
    val adc = codes.join(broadcast(table), Seq("j", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("td")).as("adc"))
    time("adc agg count") { adc.count() }
    val adcD = codes.join(broadcast(table.withColumn("td", col("td").cast("double"))), Seq("j", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("td")).as("adc"))
    time("adc agg count (double)") { adcD.count() }
    time("topKPerKey over adc") {
      graft.ops.TopK.topKPerKey(adc, Seq("query_id"),
        Seq(col("adc").asc, col("neighbor_id").asc), 10, rankCol = "rank").count() }
    time("pqTopK fast full") {
      Similarity.pqTopK(emb, qs, "vec_id", "embedding", m, k, dim, 10,
        exactEncode = false).count() }
    println("=== adc plan ===")
    println(adc.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
