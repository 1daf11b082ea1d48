package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; salting
  * is the static alternative when one side is dimension-sized but a few
  * fact keys are hot enough to pin single tasks: the fact side gets a
  * random salt in [0, salts), the dimension side is replicated once per
  * salt value, and the join key becomes (key, salt) — hot keys spread
  * over `salts` tasks at the cost of a `salts`× blow-up of the SMALL
  * side only.
  */
object Skew {

  /** Inner equi-join of `fact` (large, possibly skewed on `key`) with
    * `dim` (small) on `key`, salted across `salts` subtasks. The salt is
    * `pmod(hash(unique fact cols), salts)` when `saltExpr` is given, else
    * a uniform random salt (nondeterministic task placement, same
    * results).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 saltExpr: Option[Column] = None): DataFrame = {
    require(salts >= 1, "salts >= 1")
    val salted = fact.withColumn("__salt",
      saltExpr.map(e => pmod(hash(e), lit(salts)))
        .getOrElse((rand() * salts).cast("int")))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** The MEASUREMENT half of the salting decision — run this before
    * reaching for [[saltedJoin]] or an AQE skew threshold: per-key row
    * counts of a prospective shuffle/join key, each key's share of the
    * table and its ratio to the mean key (`hot_ratio` — 1.0 means
    * perfectly even; a key at 50× the mean pins one task at 50× the
    * median task time), and the salt factor that key would need to hit
    * `targetPerTask` rows per subtask (integer ceiling division — a
    * cold key plans salts = 1, i.e. no salting).
    *
    * Scale shape: ONE map-side-combined groupBy on the key (the same
    * shuffle the audited join would pay, minus the payload) + a
    * broadcast 1-row total; the report is the top `topK` hottest keys —
    * a bounded frame regardless of key cardinality. All ratios are
    * single correctly-rounded double divisions of exact integer counts,
    * so the report is engine-replayable.
    */
  def keySkewReport(df: DataFrame, keyCol: String, targetPerTask: Long,
                    topK: Int): DataFrame = {
    require(targetPerTask >= 1 && topK >= 1, "need targetPerTask, topK >= 1")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"),
      count(lit(1)).as("n_keys"))
    // two-stage global top-k (TopK): the count frame can itself be
    // billions of keys at corpus scale — never a single global window
    TopK.topKPerKey(counts, Seq.empty,
        Seq(col("n").desc, col("key").asc), topK, rankCol = "rank")
      .crossJoin(broadcast(tot))
      .withColumn("share", col("n").cast("double") / col("total"))
      .withColumn("hot_ratio",
        col("n").cast("double") / (col("total").cast("double") / col("n_keys")))
      .withColumn("salts",
        expr(s"(n + ${targetPerTask - 1}L) div ${targetPerTask}L"))
      .select("rank", "key", "n", "share", "hot_ratio", "salts")
  }
}
