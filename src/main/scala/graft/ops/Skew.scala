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
}
