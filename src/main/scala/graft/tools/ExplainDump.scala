package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper (round 20, not part of the driver contract): dump
  * `.explain("formatted")` for the named queries to
  * `plans/<tag>/<query>_<suffix>.txt`, so before/after plan claims in
  * OPTIMIZATION_r20.md are committed artifacts, not prose.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> q131,q158
  * (name filter matches by substring, like Verify's third arg).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART_SIZE", "64k"))
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.SparkEntry.registry
      .filter(q => names.exists(q.name.contains))
      .foreach { q =>
        val df = q.impl(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${q.name}_$suffix.txt"), plan)
        println(s"wrote $outDir/${q.name}_$suffix.txt (${plan.length} chars)")
      }
    spark.stop()
  }
}
