package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sketch aggregations: bounded-memory approximate metrics
  * over event-time windows — the streaming face of the batch sketch
  * queries (q36 HLL distinct, q46 percentile sketch). HLL++ state is
  * constant-size per (window, key) group and mergeable map-side, so the
  * operator's state footprint is O(windows × keys), independent of
  * event volume — the property that makes per-window cardinality
  * tracking viable at 100 TB/day event rates where exact distinct
  * state would be unbounded.
  */
object StreamSketch {

  /** Distinct-approximation per tumbling window and key:
    * (window_start, key, approx_distinct, n_events). Update mode behind
    * a watermark; late rows beyond the delay are dropped with their
    * window state (ST4 semantics, like DailyAgg). */
  def windowedApproxDistinct(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      distinctCol: String,
      window: String,
      watermarkDelay: String,
      rsd: Double = 0.05): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window).as("w"),
        col(keyCol))
      .agg(
        approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("approx_distinct"), col("n_events"))
}
