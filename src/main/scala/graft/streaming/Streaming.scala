package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extensions (SURVEY.md §2.10: the reference is
  * batch-only, so none of this is required for parity — it is the natural
  * streaming shape of the engine's two core flows, included so the
  * library covers unbounded inputs):
  *
  *  - [[dailyMeans]]: the hourly→daily aggregation (A1) as a tumbling
  *    1-day event-time window with a watermark — the streaming replay of
  *    the balance feed (`readStream` on the same schema the batch
  *    pipeline scans).
  *  - [[dedupByKey]]: incremental exact dedup over an unbounded corpus —
  *    first document per fingerprint passes, later duplicates drop;
  *    keyed state via `flatMapGroupsWithState`.
  *
  * Scale notes: the window aggregation is hash-partitioned by window
  * start (standard streaming shuffle); dedup state is one boolean per
  * distinct fingerprint, partitioned by key — the same 16-byte-hash
  * sharding as the batch dedup, never the text.
  */
object Streaming {

  /** Tumbling daily mean/count of `valueCol` over event-time `tsCol`
    * with a late-data watermark. Works on a streaming OR batch frame
    * (same plan, Catalyst picks the incremental execution for streams).
    */
  def dailyMeans(events: DataFrame, tsCol: String, valueCol: String,
                 watermark: String = "1 day"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day").as("w"))
      .agg(avg(col(valueCol)).as("avg_v"), count(lit(1)).as("n"))
      .select(col("w.start").as("day_start"), col("avg_v"), col("n"))

  /** Per-key session windows over event time: activity bursts separated
    * by ≥ `gap` of silence become one row (user_id, session start/end,
    * n_events, sum_value) — the streaming twin of the batch
    * `AsOf.sessionize` (q72), via Spark's native `session_window` (state
    * merges adjacent windows as late rows arrive, closed by the
    * watermark). Works on a streaming OR batch frame.
    */
  def sessionWindows(events: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, gap: String = "30 minutes",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Keyed record for streaming dedup. */
  final case class Doc(fp: String, id: Long, text: String)

  /** Emit only the FIRST document seen per fingerprint; subsequent
    * duplicates are swallowed. Append-mode compatible (state = one
    * boolean per key, no timeout — bound it with a TTL timeout in
    * deployments where fingerprints churn).
    */
  def dedupByKey(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Doc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
  }
}
