package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One key's daily observation (epoch-day, exact integer count). */
final case class DailyCount(key: String, day: Int, n: Long)

/** Persisted EWMA state: the last smoothed value in milli-units. */
final case class EwmaState(ewmaMilli: Long)

/** One smoothed point of the trend line. */
final case class EwmaPoint(key: String, day: Int, n: Long, ewmaMilli: Long)

/** Streaming twin of q141's integer EWMA trend — the stateful form of
  * the per-key recurrence e_t = (1000·αNum·x_t + (αDen−αNum)·e_{t−1})
  * div αDen (α = 1/4 by default, matching q141's
  * (1000·x + 3·e) div 4): the batch query folds each key's FULL sorted
  * series inside one `aggregate` HOF; this carries ONE long of state
  * per key across micro-batches and emits the smoothed point as each
  * day's count arrives — the live dashboard form of the same trend
  * line, bit-identical because the recurrence is exact integer
  * arithmetic in both shapes (EwmaSpec proves batch-stream duality
  * against q141's registered output and prefix-split invariance).
  *
  * Input contract: pre-aggregated (key, day, n) rows — the output of
  * an upstream windowed count (DailyAgg's shape) — delivered per key
  * in day order across micro-batches; within a micro-batch rows sort
  * by day before folding, the [[DeltaTracker]] ordering contract. An
  * EWMA is inherently sequential per key, so out-of-order days belong
  * in a watermark upstream, not here.
  *
  * Scale: state is 8 bytes per key, partitioned by the grouping key —
  * no global state, no driver loop; the key cardinality (event types,
  * states, sources) is dimension-sized by construction because the
  * DAY-grain series is calendar-bounded. */
object EwmaTracker {

  def track(in: Dataset[DailyCount], alphaNum: Long = 1L,
      alphaDen: Long = 4L): Dataset[EwmaPoint] = {
    require(alphaNum > 0 && alphaDen > alphaNum,
      s"alpha must be in (0, 1): $alphaNum/$alphaDen")
    val spark = in.sparkSession
    import spark.implicits._
    def advance(key: String, rows: Iterator[DailyCount],
        gs: GroupState[EwmaState]): Iterator[EwmaPoint] = {
      var prev = gs.getOption.map(_.ewmaMilli)
      val out = Vector.newBuilder[EwmaPoint]
      rows.toSeq.sortBy(_.day).foreach { r =>
        val e = prev match {
          case None => r.n * 1000L
          case Some(p) =>
            (r.n * 1000L * alphaNum + (alphaDen - alphaNum) * p) / alphaDen
        }
        prev = Some(e)
        out += EwmaPoint(key, r.day, r.n, e)
      }
      prev.foreach(e => gs.update(EwmaState(e)))
      out.result().iterator
    }
    in.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(advance)
  }
}
