package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build — the warehouse
  * operator that turns an append-only change stream into an interval
  * table: one row per (key, state) RUN with [valid_from, valid_to)
  * bounds, a per-key version number, and an is_current flag. The
  * reference keeps only latest-per-key KTables (its 11 materialized
  * views — `KafkaStreamsConfig.java:68-153`); the history form is what
  * an as-of join (q09) probes when "latest" isn't enough and the
  * question is "what was the state WHEN".
  *
  * Semantics: events ordered per key by (tsCol, tieCol); consecutive
  * events with an UNCHANGED state collapse into the run of their
  * predecessor (a no-op change extends no interval and mints no
  * version). valid_from = the run's first event time; valid_to = the
  * NEXT run's first event time (null on the live run — is_current).
  * Intervals per key are contiguous and non-overlapping by
  * construction.
  *
  * Scale shape: every window is partitioned by the key — each key's
  * history sorts inside its own partition, no global sort, no driver
  * state; AQE's skew split handles a hot key's oversized partition the
  * same way it does for joins. At 100 TB the usual deployment runs
  * this INCREMENTALLY (per ingest batch over last-known state, the
  * [[graft.streaming.DeltaTracker]] pattern); this batch form is the
  * backfill path and the oracle for that incremental twin.
  */
object Scd {

  /** Build the type-2 history. Input columns `keyCol`, `stateCol`,
    * `tsCol` (any orderable type), `tieCol` (the deterministic
    * same-timestamp tie-break, e.g. an event id). Returns
    * (key, state, version, valid_from, valid_to, is_current), one row
    * per run, valid_to typed like tsCol and null on the current run. */
  def buildHistory(events: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val byTime = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val marked = events
      .select(col(keyCol), col(stateCol), col(tsCol), col(tieCol))
      .withColumn("__chg",
        when(lag(col(stateCol), 1).over(byTime).isNull ||
          lag(col(stateCol), 1).over(byTime) =!= col(stateCol), 1L)
          .otherwise(0L))
      .withColumn("version",
        sum(col("__chg")).over(byTime.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val byVersion = Window.partitionBy(keyCol).orderBy(col("version"))
    marked
      .filter(col("__chg") === 1L)
      .withColumn("valid_to", lead(col(tsCol), 1).over(byVersion))
      .select(col(keyCol), col(stateCol), col("version"),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }
}
