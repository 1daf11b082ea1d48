package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the standard
  * Robertson/Okapi ranking, with one documented deviation: the published
  * idf is log((N-df+0.5)/(df+0.5)); the log is transcendental, so two
  * engines disagree in the last ulp and a bit-exact oracle is
  * impossible. We use the rational idf (N-df+0.5)/(df+0.5) — the log's
  * argument — directly. Per-term ranking is identical (the map is
  * monotone); multi-term scores weigh rare terms more aggressively than
  * the log form, which is acceptable for the pipeline uses this serves
  * (query-probing a corpus, retrieving near-matches for curation audits)
  * and keeps every arithmetic step an IEEE-identical +,×,÷ with fixed
  * association — hash-checkable end to end (q119).
  *
  * Scale shape: two jobs. (1) a map-side-combined global aggregate for
  * N, Σdl and per-term document frequencies (one row to the driver);
  * (2) a pure scan projection computing tf and the score per document —
  * no explode, no join, no shuffle — followed by the two-stage top-k.
  */
object Retrieval {

  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.matches("[a-z]+")),
      "terms must be non-empty lowercase ascii words")
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t.rlike("^[a-z]+$"))
    val base = terms.foldLeft(
      docs.select(col(idCol), toks.as("__toks"))
        .withColumn("dl", size(col("__toks")).cast("long"))) { (df, t) =>
      df.withColumn(s"tf_$t", size(filter(col("__toks"), x => x === t)).cast("long"))
    }.drop("__toks")
    val statAggs = Seq(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")) ++
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val st = base.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val n = st.getAs[Long]("n")
    val avgdl = st.getAs[Long]("sumdl").toDouble / n
    val dlr = col("dl").cast("double") / lit(avgdl)
    val comps = terms.map { t =>
      val dfT = st.getAs[Long](s"df_$t")
      val idf = ((n - dfT).toDouble + 0.5) / (dfT.toDouble + 0.5)
      val tf = col(s"tf_$t").cast("double")
      lit(idf) * (tf * lit(k1 + 1)) / (tf + lit(k1) * (lit(1 - b) + lit(b) * dlr))
    }
    val scored = base.withColumn("score", comps.reduceLeft(_ + _))
    // corpus-sized frame: the combiner form ships k-pair buffers per map
    // task instead of exchanging every scored row (TopK.globalTopKByScore
    // scaladoc; long-id/double-score frames take the TopKAgg path)
    graft.ops.TopK.globalTopKByScore(scored, "score", idCol, topK,
      rankCol = "rank")
  }
}
