package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ST5 — sessionization, streaming form (SURVEY.md §2.8: absent in the
  * reference, listed as the available extension; the batch gap→flag→
  * cumulative-sum analog with its SQL oracle is q35).
  *
  * Spark-first: `session_window(ts, gap)` is a native dynamic-gap
  * grouping — state is partitioned by (key, window), merged by the
  * session-window state operator, and finalized when the watermark
  * passes window end + gap. No custom state function needed; at scale
  * this is one keyed shuffle and RocksDB-backed state, identical shape
  * to the windowed aggregations in DailyAgg.
  */
object Sessionize {

  /** Per-key gap sessions over an event frame with columns (`keyCol`,
    * `tsCol`): one row per completed session in append mode (streaming)
    * or per session (batch). `delay` is the late-data contract. */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
}
