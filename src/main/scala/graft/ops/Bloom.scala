package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Bloom-filter join pruning — the "dynamic filter" technique: when the
  * dimension side of a semi-join is too large to broadcast raw (10^8
  * keys ≈ GBs) but its BLOOM BITS fit in a few MB, shipping the bits to
  * the fact scan prunes most non-matching rows BEFORE the shuffle, and
  * an exact join on the survivors removes the false positives. Result ≡
  * the plain semi-join, by construction (no false negatives); cost =
  * shuffle volume × selectivity instead of the full fact stream.
  *
  * Hashes are salted [[Dedup.md5Hash64]] (`key + "#bf<i>"`), so
  * membership is deterministic under any partitioning and replayable in
  * any engine with md5. The filter word array is built with ONE
  * map-side-combined groupBy (bit_or per 64-bit word) and collected —
  * bounded by mBits/64 longs, never by dimension cardinality.
  */
object Bloom {

  private def bucket(key: Column, i: Int, mBits: Int): Column =
    pmod(Dedup.md5Hash64(concat(key, lit(s"#bf$i"))), lit(mBits.toLong))

  /** Build the filter: mBits/64 longs, k salted hashes per key. */
  def filterWords(dim: DataFrame, keyCol: String, mBits: Int = 1 << 16,
                  k: Int = 4): Array[Long] = {
    require(mBits % 64 == 0 && k >= 1)
    val words = dim.filter(col(keyCol).isNotNull)
      .select(posexplode(array((0 until k).map(i =>
        bucket(col(keyCol), i, mBits)): _*)).as(Seq("i", "b")))
      .select((col("b") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("b") % 64).cast("int")).as("m"))
      .groupBy("w").agg(bit_or(col("m")).as("bits"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Array.tabulate(mBits / 64)(w => words.getOrElse(w, 0L))
  }

  /** Membership test column: true iff all k bits are set (possible
    * false positives, never false negatives).
    */
  def mightContain(key: Column, words: Array[Long], mBits: Int, k: Int): Column =
    (0 until k).map { i =>
      val b = bucket(key, i, mBits)
      (element_at(lit(words), (b / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (b % 64).cast("int")))) =!= 0L
    }.reduce(_ && _)

  /** Bloom-pruned left-semi join: prune the fact stream with the dim's
    * bloom bits, then exact semi-join the survivors. Identical to
    * `fact.join(dim, fact(factKey) === dim(dimKey), "left_semi")`.
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                    dimKey: String, mBits: Int = 1 << 16, k: Int = 4): DataFrame = {
    val words = filterWords(dim.select(col(dimKey)), dimKey, mBits, k)
    fact.filter(mightContain(col(factKey), words, mBits, k))
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_semi")
  }
}
