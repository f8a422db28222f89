package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q136 batch quota cap: admit each key's first
  * `k` events per UTC day as they arrive, suppress the rest — the
  * rate-limit / spam-cap primitive as a CONTINUOUS query (bot storms
  * throttled in-flight instead of filtered after the fact).
  *
  * Reference analogue: none directly — the closest reference shape is
  * the windowed dedup transformer's per-key suppression state
  * (covid19-patients-analyzer DeduplicationTransformer.java:62-86);
  * this is the counting generalization of "seen once → suppress" to
  * "seen k times → suppress".
  *
  * Spark-first: typed `flatMapGroupsWithState` keyed by (key, day)
  * with one Long of state (admitted-so-far) per live key-day and an
  * EVENT-TIME timeout at day end + watermark delay, so state is
  * evicted the moment the watermark proves no more of that day can
  * arrive — state size tracks live key-days, never history. In BATCH
  * mode the same function runs with timeouts inert (the engine's
  * stream-table duality contract, same as NewsDedup/DeltaTracker) and
  * admits each group's first k in (time, id) order — exactly q136's
  * oracled semantics, which is what ties the two forms together: a
  * stream whose arrival respects event-time order admits the same set
  * the batch form selects.
  *
  * Within one micro-batch a group's rows are sorted by (time, id)
  * before admission — the group's per-batch volume bounds the sort,
  * and it makes replayed/compacted batches deterministic; ACROSS
  * micro-batches admission is by arrival (the stream cannot revoke an
  * already-emitted admission — inherent to any online limiter). */
object QuotaLimiter {

  final case class QuotaEvent(eventTime: Timestamp, userId: Long, eventId: Long)
  final case class Admitted(userId: Long, day: String, rk: Long, eventId: Long)

  private val DayMs = 24L * 3600 * 1000

  /** First `k` events per (userId, UTC day). `delay` is the late-data
    * watermark; a key-day's counter lives until the watermark passes
    * day end + delay. */
  def admitFirstK(in: Dataset[QuotaEvent], k: Int,
      delay: String = "1 day"): Dataset[Admitted] = {
    require(k > 0, s"k must be positive, got $k")
    val spark = in.sparkSession
    import spark.implicits._
    val streaming = in.isStreaming
    in.withWatermark("eventTime", delay)
      .groupByKey { e =>
        val dayIdx = Math.floorDiv(e.eventTime.getTime, DayMs)
        (e.userId, dayIdx)
      }
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Long), rows: Iterator[QuotaEvent], gs: GroupState[Long]) =>
          if (gs.hasTimedOut) { gs.remove(); Iterator.empty }
          else {
            var admitted = gs.getOption.getOrElse(0L)
            val out = Seq.newBuilder[Admitted]
            val day = java.time.LocalDate
              .ofEpochDay(key._2).toString
            // per-micro-batch determinism: (time, id) order inside the
            // group's batch slice (bounded by that slice, not history)
            val sorted = rows.toArray
              .sortBy(e => (e.eventTime.getTime, e.eventId))
            for (e <- sorted if admitted < k) {
              admitted += 1
              out += Admitted(key._1, day, admitted, e.eventId)
            }
            gs.update(admitted)
            if (streaming) {
              // evict once the watermark proves the day is closed
              gs.setTimeoutTimestamp((key._2 + 1) * DayMs, delay)
            }
            out.result().iterator
          }
      }
  }
}
