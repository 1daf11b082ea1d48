package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("entry (flagship disaggregation) returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query runs on sf0.001 and returns rows") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("disaggregated shares sum to 1 per month (M24 invariant)") {
    import org.apache.spark.sql.functions._
    val df = queries.Disaggregate.query(spark, "/root/testdata/sf0.001")
    val bad = df.groupBy("mon").agg(sum("share").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9).count()
    assert(bad === 0)
  }
}
