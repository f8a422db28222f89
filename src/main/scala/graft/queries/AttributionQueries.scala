package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Round-10 wave: CONVERSION ATTRIBUTION over the `events` stream —
  * the marketing-analytics layer the funnel family (q185/q203) stops
  * short of: not "did the user convert" but "which touchpoint gets
  * the credit". Three standard models over the same touch window:
  * last-touch (winner takes all), linear (equal split), and
  * time-decay (halving per day of age). The reference has no
  * attribution — this extends the event-analytics surface
  * (SURVEY.md §2's extension queries) the way q184-q193 did.
  *
  * Shared frame: conversions are `purchase` events; touches are
  * `view`/`click`/`signup` events by the SAME user strictly before
  * the conversion and at most 7 days older. All timestamp math runs
  * on exact epoch-NANOS integers (`ts_ns` on the Spark side,
  * `epoch_ns(ts)` in DuckDB — the parquet is TIMESTAMP(NANOS), so
  * both engines see identical integers). Credits are exact integer
  * rationals (micro-units via integer division), purchase values
  * aggregate as exact cents — no FP ever enters an aggregate.
  *
  * Scale shape (all three): one scan of events split into the two
  * role frames; ONE equi-join on user_id (the range predicate rides
  * the hash join as a residual filter — never a theta-only join);
  * per-conversion logic is a window keyed on the conversion id or a
  * grouped count on it — always key-partitioned, never a global
  * sort. Fan-in per conversion is bounded by one user's 7-day
  * activity; a pathologically hot user is exactly the AQE skew-join
  * shape. Final rollup is a 4-row channel aggregate with map-side
  * combine.
  */
object AttributionQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val lookbackNs = 7L * 86400L * 1000000000L

  private def conversions(e: DataFrame): DataFrame =
    e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("ts_ns").as("conv_ns"),
        round(col("value") * 100).cast(LongType).as("value_cents"))

  private def touches(e: DataFrame): DataFrame =
    e.filter(col("event_type").isin("view", "click", "signup"))
      .select(col("event_id").as("touch_id"), col("user_id"),
        col("ts_ns").as("touch_ns"), col("event_type").as("channel"))

  /** Conversion ⋈ touch on user_id with the 7-day strict-past window
    * as a residual predicate. */
  private def windowJoin(e: DataFrame): DataFrame =
    conversions(e).join(touches(e), Seq("user_id"))
      .filter(col("touch_ns") < col("conv_ns") &&
        col("touch_ns") >= col("conv_ns") - lit(lookbackNs))

  private val sqlPrefix =
    """WITH c AS (SELECT event_id AS conv_id, user_id, epoch_ns(ts) AS conv_ns,
      |                  CAST(round(value * 100) AS BIGINT) AS value_cents
      |           FROM events WHERE event_type = 'purchase'),
      |t AS (SELECT event_id AS touch_id, user_id, epoch_ns(ts) AS touch_ns,
      |             event_type AS channel
      |      FROM events WHERE event_type IN ('view', 'click', 'signup')),
      |j AS (SELECT c.conv_id, c.conv_ns, c.value_cents, t.channel,
      |             t.touch_ns, t.touch_id
      |      FROM c JOIN t ON t.user_id = c.user_id
      |        AND t.touch_ns < c.conv_ns
      |        AND t.touch_ns >= c.conv_ns - 604800000000000),""".stripMargin

  /** q216: LAST-TOUCH attribution — each purchase credits the single
    * most recent in-window touch, (touch_ns desc, touch_id desc)
    * total-order tie-break; purchases with an empty window credit the
    * 'none' channel so the model accounts for every conversion.
    * share_ppm = floor(10⁶·n_conv/total purchases), an exact
    * partition of (almost) the whole ppm space. */
  val lastTouch: Q = Q(
    "q216_attribution_last_touch",
    s"""$sqlPrefix
      |l AS (SELECT conv_id, channel,
      |             row_number() OVER (PARTITION BY conv_id
      |               ORDER BY touch_ns DESC, touch_id DESC) AS rn
      |      FROM j),
      |a AS (SELECT c.conv_id, c.value_cents,
      |             coalesce(l.channel, 'none') AS channel
      |      FROM c LEFT JOIN (SELECT conv_id, channel FROM l WHERE rn = 1) l
      |        USING (conv_id)),
      |tot AS (SELECT count(*) AS n FROM c)
      |SELECT channel, CAST(count(*) AS BIGINT) AS n_conv,
      |       CAST(sum(value_cents) AS BIGINT) AS value_cents,
      |       (1000000 * count(*)) // max(tot.n) AS share_ppm
      |FROM a CROSS JOIN tot GROUP BY channel""".stripMargin
  ) { (s, dir) =>
    val e = t(s, dir, "events")
    val w = Window.partitionBy("conv_id")
      .orderBy(col("touch_ns").desc, col("touch_id").desc)
    val last = windowJoin(e)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("conv_id"), col("channel"))
    val tot = conversions(e).agg(count(lit(1)).as("n"))
    conversions(e).join(last, Seq("conv_id"), "left")
      .select(col("value_cents"),
        coalesce(col("channel"), lit("none")).as("channel"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_conv"), sum("value_cents").as("value_cents"))
      .crossJoin(broadcast(tot))
      .select(col("channel"), col("n_conv"), col("value_cents"),
        expr("(1000000 * n_conv) div n").cast(LongType).as("share_ppm"))
  }

  /** q217: LINEAR attribution — every in-window touch of a purchase
    * gets the equal split floor(10⁶/n_touches) in micro-units; the
    * per-channel sum is the channel's fractional-conversion count
    * ×10⁶. Exact integers end-to-end: the only division is integer
    * division by the per-conversion touch count. */
  val linear: Q = Q(
    "q217_attribution_linear",
    s"""$sqlPrefix
      |n AS (SELECT conv_id, count(*) AS nt FROM j GROUP BY conv_id)
      |SELECT j.channel, CAST(count(*) AS BIGINT) AS n_touches,
      |       CAST(sum(1000000 // n.nt) AS BIGINT) AS credit_u6
      |FROM j JOIN n USING (conv_id)
      |GROUP BY j.channel""".stripMargin
  ) { (s, dir) =>
    val j = windowJoin(t(s, dir, "events"))
    val n = j.groupBy("conv_id").agg(count(lit(1)).as("nt"))
    j.join(n, Seq("conv_id"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        sum(expr("1000000 div nt")).as("credit_u6"))
  }

  /** q218: TIME-DECAY attribution — a touch's credit halves for every
    * full day between it and the conversion:
    * w = floor(10⁶ / 2^age_days), age_days = floor(Δns/86400·10⁹) ∈
    * [0, 6] by the window bound. The power of two evaluates as an
    * integer shift on both engines — no transcendental function
    * (exp/pow return engine-specific doubles; a shift is exact), the
    * same discipline that keeps integer PageRank portable. */
  val timeDecay: Q = Q(
    "q218_attribution_time_decay",
    s"""$sqlPrefix
      |w AS (SELECT channel,
      |             1000000 // (CAST(1 AS BIGINT) <<
      |               ((conv_ns - touch_ns) // 86400000000000)) AS w_u6
      |      FROM j)
      |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
      |       CAST(sum(w_u6) AS BIGINT) AS decay_credit_u6
      |FROM w GROUP BY channel""".stripMargin
  ) { (s, dir) =>
    windowJoin(t(s, dir, "events"))
      .select(col("channel"),
        expr("1000000 div shiftleft(1L, cast((conv_ns - touch_ns) div 86400000000000 as int))")
          .as("w_u6"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        sum(col("w_u6")).as("decay_credit_u6"))
  }

  val all: Seq[Q] = Seq(lastTouch, linear, timeDecay)
}
