package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Clustering

/** Scratch profiling / plan-audit main (not part of the driver contract).
  * Round 4: q53 cost decomposition (prep / init / Lloyd iterations).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // q88 decomposition: decimal-capture product moments vs plain doubles
    locally {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      time("q88 scan+count") { li.select(cs.map(col): _*).count() }
      val dAggs = (cs.map(c => sum(col(c)).as(s"s_$c")) ++
        (for (i <- cs.indices; j <- i until cs.length)
          yield sum(col(cs(i)) * col(cs(j))).as(s"p_${i}_$j")) :+
        count(lit(1)).as("n"))
      time("q88 double moments") { li.agg(dAggs.head, dAggs.tail: _*).head() }
      time("q88 grid (bench-exact)") {
        Clustering.corrMatrixGrid(li, cs, decimals = 2)
          .write.format("noop").mode("overwrite").save()
      }
      time("q88 grid warm") {
        Clustering.corrMatrixGrid(li, cs, decimals = 2)
          .write.format("noop").mode("overwrite").save()
      }
      time("q88 decimal (old baseline)") {
        Clustering.corrMatrix(li, cs).write.format("noop").mode("overwrite").save()
      }
    }
    // bench-exact q53: NO outer cache — dtwKMeans materializes upstream
    time("q53 bench-exact cold") {
      SparkEntry.queries("q53_dtw_kmeans")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("q53 bench-exact warm") {
      SparkEntry.queries("q53_dtw_kmeans")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), Tables.eventDay.as("day"))
      .agg(graft.ops.Exact.davg(col("value")).as("val"))
    val dense = Clustering.completeSeries(daily, Seq("user_id"), "day", "val")
    val series = Clustering.seriesMatrix(dense, Seq("user_id"), "day", "val")
    val scaled = Clustering.minMaxScaleArray(series, "vec", "svec")
    time("prep uncached count") { scaled.count() }
    val n = time("prep (count scaled)") { scaled.cache().count() }
    println(s"n series = $n")
    val len = scaled.select(size(col("svec"))).head.getInt(0)
    println(s"series len = $len")
    time("kmeans k=2 it=1") {
      Clustering.dtwKMeans(scaled, "user_id", "svec", 2, maxIter = 1).assignments.count()
    }
    time("kmeans k=12 it=1") {
      Clustering.dtwKMeans(scaled, "user_id", "svec", 12, maxIter = 1).assignments.count()
    }
    time("kmeans k=12 it=5") {
      Clustering.dtwKMeans(scaled, "user_id", "svec", 12, maxIter = 5).assignments.count()
    }
    time("assign-only scan") {
      val bc = spark.sparkContext.broadcast(Array.fill(12)(Array.fill(30)(0.5)))
      val assignUdf = udf { (v: Seq[Double]) =>
        val arr = v.toArray
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < bc.value.length) {
          val d = Clustering.dtw(arr, bc.value(c)); if (d < bestD) { bestD = d; best = c }; c += 1
        }
        best
      }
      scaled.withColumn("cl", assignUdf(col("svec"))).groupBy("cl").count().collect()
    }
    spark.stop()
  }
}
