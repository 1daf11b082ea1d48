package graft

/** Prints the query registry in registration order — the index↔name
  * mapping for Bench's positional `"queries"` array (BENCH_r*.json).
  * No Spark session needed: `sbt "runMain graft.QOrder"`.
  */
object QOrder {
  def main(args: Array[String]): Unit =
    SparkEntry.registry.map(_.name).zipWithIndex.foreach { case (n, i) =>
      println(f"$i%3d $n")
    }
}
