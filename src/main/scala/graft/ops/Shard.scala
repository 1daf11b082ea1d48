package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Rendezvous (highest-random-weight) shard routing — the consistent
  * assignment a 100 TB ingest needs: shard(key) = argmax over shards of
  * a salted key hash. Unlike `pmod(hash, n)`, changing the shard count
  * from n to n-1 reassigns ONLY the keys that lived on the removed
  * shard (every other key's argmax is untouched) — no corpus-wide
  * reshuffle on topology changes. Salted [[Dedup.md5Hash64]] makes the
  * assignment deterministic and engine-replayable; the whole thing is a
  * scan projection (no shuffle, no state).
  */
object Shard {

  /** Shard id in [0, nShards) via HRW over salted md5 hashes. */
  def rendezvous(key: Column, nShards: Int): Column = {
    require(nShards >= 1)
    array_max(array((0 until nShards).map(i =>
      struct(Dedup.md5Hash64(concat(key, lit(s"#shard$i"))).as("h"),
        lit(i.toLong).as("i"))): _*)).getField("i")
  }

  /** Per-shard reproducibility manifest — the record a data release
    * ships next to its shards so a REBUILT corpus can be proven
    * identical shard-by-shard without re-reading either copy's bytes:
    * per [[rendezvous]] shard, document and token counts, the distinct
    * canonical-fingerprint count, an ORDER-FREE content checksum (the
    * exact decimal sum of each doc's 64-bit fingerprint hash, wrapped
    * to two's-complement int64), and the min/max fingerprints.
    *
    * The checksum is commutative and associative, which is the whole
    * point: it is invariant under partitioning and row order (a sorted
    * string_agg-of-fps would need a per-shard global sort), and it
    * maintains INCREMENTALLY — an appended doc adds its hash, a
    * takedown subtracts it — so the manifest of corpus v2 derives from
    * v1's manifest plus the change log, never a rescan (the q135
    * sketch-merge law, applied to integrity). The decimal(38,0)
    * accumulator is exact to ~10³⁸, i.e. ~10¹⁹ documents per shard,
    * before the final mod-2⁶⁴ wrap; every stage is engine-replayable.
    */
  def shardManifest(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, nShards: Int)
      : org.apache.spark.sql.DataFrame = {
    val s = manifestBase(df, idCol, textCol, nShards).groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).as("n_tokens"),
      countDistinct(col("fp")).as("n_distinct_fp"),
      sum(col("fph")).as("__sum"),
      min(col("fp")).as("min_fp"),
      max(col("fp")).as("max_fp"))
    wrapChecksum(s)
      .select("shard", "n_docs", "n_tokens", "n_distinct_fp",
        "fp_checksum", "min_fp", "max_fp")
  }

  /** Streaming twin of [[shardManifest]] — the "maintains incrementally"
    * claim made executable: the SAME shard/fingerprint projection over
    * an unbounded document stream with a streaming groupBy, emitting
    * each shard's CURRENT manifest whenever a micro-batch touches it
    * (Update mode — the natural sink is an upsert store). Identical to
    * the batch manifest over the same rows, MINUS `n_distinct_fp`
    * (exact distinct is unbounded per-key state on a stream; pair with
    * the q141 HLL aggregate when an estimate suffices). State per shard
    * is five scalars — O(nShards) total regardless of corpus size.
    */
  def shardManifestStream(docs: org.apache.spark.sql.DataFrame, idCol: String,
                          textCol: String, nShards: Int)
      : org.apache.spark.sql.DataFrame = {
    val s = manifestBase(docs, idCol, textCol, nShards).groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).as("n_tokens"),
      sum(col("fph")).as("__sum"),
      min(col("fp")).as("min_fp"),
      max(col("fp")).as("max_fp"))
    wrapChecksum(s)
      .select("shard", "n_docs", "n_tokens", "fp_checksum", "min_fp", "max_fp")
  }

  /** Shared scan projection: shard id, canonical fingerprint, token
    * count, and the fingerprint's 64-bit hash widened to DECIMAL(38,0)
    * (exact to ~10¹⁹ docs/shard before the mod-2⁶⁴ wrap).
    */
  private def manifestBase(df: org.apache.spark.sql.DataFrame, idCol: String,
                           textCol: String, nShards: Int)
      : org.apache.spark.sql.DataFrame =
    df.select(
      rendezvous(col(idCol).cast("string"), nShards).as("shard"),
      graft.text.TextOps.fingerprint(col(textCol)).as("fp"),
      graft.text.TextOps.tokenCount(col(textCol)).as("n_tok"))
      .withColumn("fph",
        Dedup.md5Hash64(col("fp"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))

  /** Wrap the exact decimal `__sum` to a two's-complement int64
    * `fp_checksum` (mod 2⁶⁴), dropping the intermediate column.
    */
  private def wrapChecksum(s: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val two64 = java.math.BigDecimal.valueOf(2).pow(64)
    val two63 = java.math.BigDecimal.valueOf(2).pow(63)
    val m = pmod(col("__sum"), lit(two64))
    s.withColumn("fp_checksum",
        when(m >= lit(two63), m - lit(two64)).otherwise(m).cast("long"))
      .drop("__sum")
  }
}
