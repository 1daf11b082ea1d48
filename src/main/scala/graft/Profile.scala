package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiling / plan-audit main (not part of the driver contract).
  * Round 14: does cosineTopK's corpus-norm alias re-evaluate per pair
  * under the BNLJ (the PQ-encode deferral class)? A/B: current operator
  * vs a variant with the (id, vec, norm) frame pinned.
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
    val dim = 64; val k = 10
    def emb = graft.tools.ScaleStress.annEmbeddings(spark, n, dim)
    def qs = graft.tools.ScaleStress.annEmbeddings(spark, 64L, dim)
    // warm
    Similarity.cosineTopK(graft.tools.ScaleStress.annEmbeddings(spark, 20000L, dim),
      graft.tools.ScaleStress.annEmbeddings(spark, 8L, dim),
      "vec_id", "embedding", k).count()
    time("cosineTopK current") {
      Similarity.cosineTopK(emb, qs, "vec_id", "embedding", k).count() }
    // variant: stage-1 with corpus (id, vec, norm) PINNED before the BNLJ
    time("stage1 variant: pinned norms") {
      val q = broadcast(qs.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"),
        sqrt(Similarity.dot(col("embedding"), col("embedding"))).as("qnD")))
      val c = graft.ops.Pin.pin(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"),
        sqrt(Similarity.dot(col("embedding"), col("embedding"))).as("cnD")))
      val dscored = c.join(q, col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          (Similarity.dot(col("qv"), col("cv")) / (col("qnD") * col("cnD"))).as("dcos"))
      dscored.groupBy("query_id")
        .agg(graft.ops.TopKAgg.topK(col("dcos"), col("neighbor_id"), k, 1e-9).as("t"))
        .count()
    }
    // and stage-1 of the CURRENT form alone, for a like-for-like read
    time("stage1 current (unpinned)") {
      val q = broadcast(qs.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"),
        sqrt(Similarity.dot(col("embedding"), col("embedding"))).as("qnD")))
      val c = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"),
        sqrt(Similarity.dot(col("embedding"), col("embedding"))).as("cnD"))
      val dscored = c.join(q, col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          (Similarity.dot(col("qv"), col("cv")) / (col("qnD") * col("cnD"))).as("dcos"))
      dscored.groupBy("query_id")
        .agg(graft.ops.TopKAgg.topK(col("dcos"), col("neighbor_id"), k, 1e-9).as("t"))
        .count()
    }

    // native-encode packed codes UNPINNED into the BNLJ: is the
    // per-pair deferral specific to the declarative struct-min tree,
    // or does the (cheap) native argmin also re-run per pair?
    time("pq native unpinned scored+agg") {
      val m = 8; val kk = 16; val dsub = dim / m
      val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", m, kk, dim)
      val cbRows = cb.collect().map(r => ((r.getInt(0), r.getInt(1)),
        r.getSeq[Float](2).map(_.toDouble).toIndexedSeq)).toMap
      val cents = (0 until m).flatMap(j => (0 until kk).map(c => cbRows((j, c)))).toIndexedSeq
      val codes = org.apache.spark.sql.graft.Bridge.column(
        graft.functions.PqEncodeCodes(
          org.apache.spark.sql.graft.Bridge.expression(col("embedding")),
          cents, m, kk, dsub))
      val packed = emb.select(col("vec_id").as("neighbor_id"), codes.as("codes"))
      val qsubs = qs.select(col("vec_id").as("query_id"),
          explode(sequence(lit(0), lit(m - 1))).as("j"), col("embedding"))
        .withColumn("qsub", slice(col("embedding"), col("j") * dsub + 1, lit(dsub)))
        .drop("embedding")
      val table = qsubs.join(broadcast(cb), Seq("j"))
        .withColumn("td", Similarity.sqDistExact(col("qsub"), col("cvec")).cast("double"))
        .select("query_id", "j", "code", "td")
      val qtblD = table.groupBy("query_id")
        .agg(transform(array_sort(collect_list(struct(col("j"), col("code"), col("td")))),
          x => x.getField("td")).as("__qt"))
      val scored = packed.join(broadcast(qtblD), col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          (0 until m).map(j => element_at(col("__qt"),
            lit(j * kk + 1) + element_at(col("codes"), j + 1))).reduce(_ + _).as("adcD"))
      scored.groupBy("query_id")
        .agg(graft.ops.TopKAgg.topK(-col("adcD"), col("neighbor_id"), 10, 1e-9).as("t"))
        .select(explode(col("t"))).count()
    }
    spark.stop()
  }
}
