package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One incremental count delta for a day's event-type mix. */
final case class TypeCount(day: Int, eventType: String, c: Long)

/** Persisted mix state: the day's running per-type counts. */
final case class MixState(counts: Map[String, Long])

/** One live reading of a day's mix entropy. */
final case class EntropyPoint(day: Int, n: Long, hU6: Long)

/** Streaming twin of q233's per-day Shannon entropy — the live
  * mix-diversity dashboard: each micro-batch's (day, type, Δcount)
  * rows fold into the day's running counts and the day re-emits its
  * entropy, refining toward the batch answer as events stream in.
  * Entropy is a pure function of the FINAL counts (order-immune), so
  * the day's LAST emission is bit-identical to the batch query under
  * any micro-batch split — EntropySpec proves the duality against
  * q233's registered output and a 3-way prefix split.
  *
  * Exactness: each type's term micro-quantizes through the SAME
  * half-up decimal rounding Spark's `round` applies to doubles
  * (BigDecimal.valueOf → setScale HALF_UP), and the per-day sum is
  * exact integer addition — the q233 contract, re-executed in JVM
  * code instead of Catalyst expressions.
  *
  * Scale: state is one (type → count) map per DAY — both dimensions
  * calendar/dimension-bounded by construction (unlike user-keyed
  * trackers, the key space cannot churn), so `NoTimeout` retention is
  * a constant of the calendar, not a leak. Partitioned by day; no
  * global state, no driver loop. */
object EntropyTracker extends Serializable {

  /** (n, hU6) of a count mix — q233's quantization, order-immune. */
  private[graft] def entropyU6(counts: Iterable[Long]): (Long, Long) = {
    val n = counts.sum
    var h = 0L
    counts.foreach { c =>
      if (c > 0) {
        val term = 1000000.0 * (c.toDouble / n) * math.log(n.toDouble / c)
        h += java.math.BigDecimal.valueOf(term)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }
    }
    (n, h)
  }

  def track(in: Dataset[TypeCount]): Dataset[EntropyPoint] = {
    val spark = in.sparkSession
    import spark.implicits._
    def advance(day: Int, rows: Iterator[TypeCount],
        gs: GroupState[MixState]): Iterator[EntropyPoint] = {
      var m = gs.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
      rows.foreach { r =>
        m = m.updated(r.eventType, m.getOrElse(r.eventType, 0L) + r.c)
      }
      gs.update(MixState(m))
      val (n, h) = entropyU6(m.values)
      Iterator(EntropyPoint(day, n, h))
    }
    in.groupByKey(_.day)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(advance)
  }
}
