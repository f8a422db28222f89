package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user's raw event for funnel tracking (epoch-micros event time). */
final case class UserEvent(userId: Long, eventType: String, tsUs: Long)

/** Persisted per-user funnel progress: event times of the stages
  * reached so far, in order. */
final case class FunnelProgress(reached: Seq[Long])

/** A completed conversion: the event times of the three stages. */
final case class FunnelConversion(userId: Long, t1Us: Long, t2Us: Long,
    t3Us: Long)

/** Streaming twin of q185's conversion funnel — the per-user state
  * machine form of the ordered-step reachability query: the FIRST
  * step-0 event arms the funnel, and each later stage advances on the
  * first matching event STRICTLY after the previous stage within the
  * step timeout. Because events are processed in event-time order, the
  * "first qualifying" event IS the `min(ts)` the batch query selects,
  * so the two forms agree exactly (FunnelSpec proves batch-stream
  * duality and prefix-split invariance).
  *
  * A stage that times out never re-arms — q185's semantics: the
  * window hangs off the FIRST view, and later views do not re-open
  * it. Emission is Append-mode: one row per user, at the micro-batch
  * where the final stage is reached.
  *
  * Ordering contract (same as [[DeltaTracker]]): rows are sorted by
  * event time WITHIN each micro-batch; across batches the stream must
  * deliver each user's events in event-time order (prefix splits). A
  * view arriving after a later view was already processed cannot
  * retroactively re-qualify clicks the earlier arming rejected —
  * bounded disorder belongs in a watermark upstream.
  *
  * Scale: state is one tiny record per user, partitioned by the
  * grouping key — no global state, no driver loop; identical code
  * path under batch and Structured Streaming. CAVEAT — state keys are
  * UNBOUNDED: unlike [[EwmaTracker]]'s calendar-bounded (day, type)
  * keys, one record per ALL-TIME user accumulates on a long-running
  * stream with churning users (`GroupStateTimeout.NoTimeout` below).
  * That is not an oversight: the no-re-arm contract (q185's semantics
  * — the window hangs off the FIRST step-0 event EVER, later events
  * never re-open it) requires remembering every user who has armed,
  * because evicting a dead funnel's record would let that user's next
  * step-0 event re-arm as if first. A deployment that can bound the
  * funnel's lookback (e.g. a campaign window: "first view AFTER the
  * campaign start") can safely add a generous state timeout of
  * lookback + stepTimeout·(steps-1); with no such bound, budget state
  * at ~one small record per distinct user (RocksDB state store holds
  * this spilled, so memory is not the limit — store size is).
  */
object FunnelTracker {

  val DefaultSteps: Seq[String] = Seq("view", "click", "purchase")
  val StepTimeoutUs: Long = 7L * 24 * 3600 * 1000000L

  def track(in: Dataset[UserEvent],
      steps: Seq[String] = DefaultSteps,
      stepTimeoutUs: Long = StepTimeoutUs): Dataset[FunnelConversion] = {
    require(steps.size == 3, s"3-step funnel, got ${steps.size}")
    val spark = in.sparkSession
    import spark.implicits._
    def advance(userId: Long, rows: Iterator[UserEvent],
        gs: GroupState[FunnelProgress]): Iterator[FunnelConversion] = {
      var reached = gs.getOption.map(_.reached.toVector).getOrElse(Vector.empty)
      val out = Vector.newBuilder[FunnelConversion]
      rows.toSeq.sortBy(_.tsUs).foreach { e =>
        val k = reached.length
        if (k < steps.length && e.eventType == steps(k) &&
            (k == 0 || (e.tsUs > reached.last &&
              e.tsUs <= reached.last + stepTimeoutUs))) {
          reached = reached :+ e.tsUs
          if (reached.length == steps.length)
            out += FunnelConversion(userId, reached(0), reached(1), reached(2))
        }
      }
      gs.update(FunnelProgress(reached))
      out.result().iterator
    }
    in.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(advance)
  }
}
