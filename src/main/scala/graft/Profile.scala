package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.limit(5).write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("OLD explode(shingles)") {
      println(docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("s")).count())
    }
    time("NEW shingleRows") {
      println(Dedup.shingleRows(docs, "doc_id", "text", 3).count())
    }
    time("OLD again") {
      println(docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("s")).count())
    }
    time("NEW again") {
      println(Dedup.shingleRows(docs, "doc_id", "text", 3).count())
    }
    time("q80 plan") {
      val plan = Dedup.minhashNearDupsMd5(docs, "doc_id", "text")
        .queryExecution.executedPlan.toString
      println("ReusedExchange occurrences: " + "ReusedExchange".r.findAllIn(plan).length)
      println("HashAggregate occurrences: " + "HashAggregate".r.findAllIn(plan).length)
      println("Window occurrences: " + "Window".r.findAllIn(plan).length)
    }
    time("q80 full") {
      Dedup.minhashNearDupsMd5(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("sigs (minhashTableMd5)") {
      Dedup.minhashTableMd5(docs, "doc_id", "text").write.format("noop").mode("overwrite").save()
    }
    time("q77 full") {
      Dedup.jaccardPairs(docs, "doc_id", "text").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
