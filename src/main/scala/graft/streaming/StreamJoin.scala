package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the continuous form of q81's
  * first-touch funnel (SURVEY.md §2.3: the reference has NO stream
  * joins at all; this is the Spark-native capability a complete engine
  * adds, like ST5's sessionization).
  *
  * Spark-first: two watermarked streams equi-join on the key with an
  * event-time interval predicate; the engine keeps BOTH sides' state
  * only inside the interval bound (state eviction is derived from the
  * watermarks + time-range condition — no custom state function, no
  * TTL bookkeeping). At scale this is one co-partitioned keyed shuffle
  * per side and RocksDB-backed buffers bounded by
  * rate × (interval + watermark delay).
  */
object StreamJoin {

  /** Conversions: for each left event (e.g. `view`), every right event
    * (e.g. `purchase`) by the same key whose timestamp falls in
    * (leftTs, leftTs + `withinMillis`]. Inner join — unmatched lefts
    * expire silently; use the batch q81 for the full
    * converted/unconverted report. Columns: key, left ts, right ts,
    * lag_ms. */
  def within(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, withinMillis: Long, delay: String): DataFrame =
    joined(left, right, keyCol, tsCol, withinMillis, delay, "inner")

  /** [[within]] as a LEFT OUTER interval join: unmatched left events
    * are emitted with null right columns once the watermark proves no
    * in-bound match can still arrive — the "did NOT convert" stream,
    * which an inner join can never produce. Null-emission timing is
    * the engine's watermark bookkeeping, not custom state. */
  def withinOrExpired(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, withinMillis: Long, delay: String): DataFrame =
    joined(left, right, keyCol, tsCol, withinMillis, delay, "left_outer")

  private def joined(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, withinMillis: Long, delay: String,
      joinType: String): DataFrame = {
    val l = left.withWatermark(tsCol, delay)
      .select(col(keyCol).as("k"), col(tsCol).as("l_ts"))
    val r = right.withWatermark(tsCol, delay)
      .select(col(keyCol).as("rk"), col(tsCol).as("r_ts"))
    l.join(r,
        col("k") === col("rk") &&
          col("r_ts") > col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMillis MILLISECONDS"),
        joinType)
      .select(col("k").as(keyCol), col("l_ts"), col("r_ts"),
        (unix_millis(col("r_ts")) - unix_millis(col("l_ts"))).as("lag_ms"))
  }
}
