package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance for a mutable corpus: CDC-style latest-wins
  * merge (the compaction half of a Delta/Iceberg-style MERGE, expressed
  * as a plain deterministic aggregate so it runs on any store).
  *
  * A 100 TB training corpus is not write-once: crawls re-fetch pages,
  * takedowns delete documents, re-extraction rewrites text. The
  * maintained table is then the fold of a change log — for each key,
  * the highest-version change wins, and a winning delete tombstone
  * removes the row. The reference's incremental flow (ETL.py appends
  * new balance years onto the saved CSVs) is the insert-only special
  * case of this operator.
  *
  * Scale shape: ONE map-side-combined shuffle on `key` — each partition
  * reduces its local changes to one candidate row per key before the
  * exchange, so a key touched by k changes ships min(partitions, k)
  * rows, not k. No window (a row_number keeper would sort every
  * change group); the winner is a `max(struct(version, payload…))`
  * partial aggregate. The winning payload (for a corpus, the document
  * text) crosses the wire once — that is the irreducible cost of
  * compaction; the keep-DECISION itself would need only (key, version),
  * so a text-heavy deployment can run this on (key, version, fp) and
  * re-join winners to payloads (the q112/q154 keep-best pattern).
  *
  * Determinism: `versionCol` must totally order each key's changes
  * (CDC log offsets, monotonic snapshot ids). Ties on version order
  * next by `opCol` (binary string order, so an upsert 'U'/'I' always
  * beats a same-version delete 'D' — a tombstone never silently wins a
  * concurrent-write race), then by the remaining struct fields in
  * column order. The streaming twin
  * [[graft.streaming.Streaming.latestWinsStream]] applies the SAME
  * (version, op) rule; only the residual payload tie (same key, same
  * version, same op) is engine-specific (struct order here, arrival
  * order there) — callers wanting strict semantics should guarantee
  * distinct versions per key.
  */
object Merge {

  /** Fold a change log to the live snapshot. `changes` must carry
    * `key`, `versionCol`, and `opCol` (payload = every other column);
    * rows whose winning op equals `deleteOp` are dropped. Output schema
    * = input schema, one row per surviving key.
    */
  def latestWins(changes: DataFrame, key: String, versionCol: String,
                 opCol: String, deleteOp: String = "D"): DataFrame = {
    require(changes.columns.contains(versionCol) && changes.columns.contains(opCol),
      s"changes must carry $versionCol and $opCol")
    val payload = changes.columns.filterNot(_ == key).toSeq
    // version leads the struct, op second (explicit 'U' > 'D' tie rule
    // shared with the streaming twin); remaining payload fields only
    // break the (discouraged) same-version-same-op residual.
    val winner = max(struct((versionCol +: opCol +: payload
      .filterNot(c => c == versionCol || c == opCol)).map(col): _*))
    changes.groupBy(col(key))
      .agg(winner.as("__w"))
      .select(col(key) +: payload.map(c => col(s"__w.`$c`").as(c)): _*)
      .filter(col(opCol) =!= deleteOp)
      .select(changes.columns.map(col).toIndexedSeq: _*)
  }
}
