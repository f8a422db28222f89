package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowed heavy hitters on the Misra-Gries summary — the
  * bounded-memory companion of [[StreamSketch]]'s HLL: per tumbling
  * window, the top-k keys by (estimated) frequency, tracked with at
  * most `capacity` counters per window regardless of key cardinality.
  * Exact per-(window, key) counting would need state proportional to
  * the distinct-key count; Misra-Gries guarantees every estimate sits
  * within `decrements ≤ n/capacity` of the true count (n = window
  * volume), which is the classical bound that makes per-window top-k
  * viable at 100 TB/day event rates.
  *
  * Spark-first form: `flatMapGroupsWithState` keyed on the window
  * start, `EventTimeTimeout` eviction once the watermark passes the
  * window's grace period (ST3/ST4 semantics like NewsDedup) — state
  * is O(windows × capacity), partitioned by window, no global
  * structure. Each micro-batch re-emits the window's current top-k as
  * EXACTLY k rows — ranks past the live counter set carry a null key
  * (estCount 0) — so a downstream upsert by (window, rank) always
  * overwrites a rank whose previous holder fell out of the summary
  * (Misra-Gries decrements can shrink the counter set between
  * batches; without the tombstones a stale rank row would survive
  * forever).
  */
object HeavyHitters {

  /** One emitted ranking row. `estCount` underestimates by at most
    * `maxErr` (the summary's decrement total): estCount ≤ true ≤
    * estCount + maxErr. A null `key` is a rank tombstone: fewer than
    * `rn` keys are currently tracked for this window. */
  case class HitRow(windowStart: Timestamp, key: String, estCount: Long,
      maxErr: Long, rn: Int)

  /** Bounded summary state for one window. */
  case class MgState(counters: Map[String, Long], decrements: Long)

  /** Top-`k` keys per `windowMillis` tumbling window with at most
    * `capacity` tracked counters per window; windows are evicted once
    * the watermark passes their end + `graceMillis`. */
  def windowedTopK(events: DataFrame, tsCol: String, keyCol: String,
      windowMillis: Long, graceMillis: Long, capacity: Int,
      k: Int): Dataset[HitRow] = {
    require(capacity >= k, s"capacity $capacity below k $k")
    val spark = events.sparkSession
    import spark.implicits._
    val bucketed = events
      .withWatermark(tsCol, s"$graceMillis milliseconds")
      .select(
        timestamp_millis(
          floor(unix_millis(col(tsCol)) / windowMillis).cast("long")
            * windowMillis).as("ws"),
        col(tsCol).as("ts"),
        col(keyCol).cast("string").as("k"))
      .as[(Timestamp, Timestamp, String)]
    bucketed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        update(windowMillis, graceMillis, capacity, k))
  }

  private def update(windowMillis: Long, graceMillis: Long, capacity: Int,
      k: Int)(
      ws: Timestamp,
      rows: Iterator[(Timestamp, Timestamp, String)],
      gs: GroupState[MgState]): Iterator[HitRow] = {
    if (gs.hasTimedOut) {
      gs.remove()
      Iterator.empty
    } else {
      var st = gs.getOption.getOrElse(MgState(Map.empty, 0L))
      // shuffle-arrival order is nondeterministic; fix a processing
      // order so a replayed batch rebuilds the identical summary
      rows.toSeq.sortBy(r => (r._2.getTime, r._3)).foreach { r =>
        val key = r._3
        st.counters.get(key) match {
          case Some(c) => st = st.copy(counters = st.counters.updated(key, c + 1))
          case None if st.counters.size < capacity =>
            st = st.copy(counters = st.counters.updated(key, 1L))
          case None =>
            // Misra-Gries overflow: decrement every counter, drop zeros
            st = MgState(
              st.counters.collect { case (kk, c) if c > 1 => kk -> (c - 1) },
              st.decrements + 1)
        }
      }
      gs.update(st)
      gs.setTimeoutTimestamp(ws.getTime + windowMillis + graceMillis)
      val top = st.counters.toSeq
        .sortBy { case (kk, c) => (-c, kk) }
        .take(k)
        .zipWithIndex
        .map { case ((kk, c), i) => HitRow(ws, kk, c, st.decrements, i + 1) }
      // pad to exactly k rows: a rank whose holder fell out of the
      // summary must be overwritten downstream, not left stale
      (top ++ (top.length until k).map(i =>
        HitRow(ws, null, 0L, st.decrements, i + 1))).iterator
    }
  }
}
