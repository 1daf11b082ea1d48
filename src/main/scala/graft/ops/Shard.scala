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
}
