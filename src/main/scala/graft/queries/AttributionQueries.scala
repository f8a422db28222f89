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

  /** q263: SHAPLEY-VALUE attribution — the order-free, axiomatic
    * credit split the positional models (q216-q218) approximate: each
    * channel's value is its average marginal contribution to the
    * conversion rate across every coalition of the other channels.
    * The game: players = the three touch channels; v(S) = conversion
    * rate (ppm, floor) among users whose EXACT exposure set is S, with
    * v ≡ 0 on exposure sets no user exhibits (a total characteristic
    * function, so the efficiency axiom Σᵢφᵢ = v(N) − v(∅) holds
    * EXACTLY — AttributionSpec asserts it in integers). With n = 3
    * fixed by the channel taxonomy, the subset lattice (8 masks) and
    * the 12 (channel, S, S∪{i}) marginal pairs are LITERAL tables with
    * integer weights w = |S|!·(n−1−|S|)!, denominator n! = 6 — so φ is
    * an exact 6-scaled integer (`phi6`); the ppm view divides once in
    * a fixed-shape double both engines round identically. No floor
    * division ever sees a negative operand (Spark `div` truncates
    * toward zero while DuckDB `//` floors — they only agree on
    * nonnegatives, and marginal contributions CAN be negative, hence
    * the 6-scaled-integer + round(x/6.0) design).
    *
    * Scale shape: one events scan → two user-grain distincts; the
    * coalition table is ≤ 8 rows, the lattice literal, the Shapley
    * sum a broadcast join over 12 rows — the combinatorics never
    * touch row-count-proportional data, which is exactly why
    * exact-exposure Shapley (unlike journey-permutation Shapley)
    * survives 100 TB. */
  val shapley: Q = Q(
    "q263_shapley_attribution",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |tch AS (SELECT DISTINCT user_id, event_type AS ch FROM events
      |        WHERE event_type IN ('view', 'click', 'signup')),
      |cv AS (SELECT DISTINCT user_id, CAST(1 AS BIGINT) AS conv
      |       FROM events WHERE event_type = 'purchase'),
      |mask AS (SELECT u.user_id,
      |           coalesce(string_agg(t.ch, ',' ORDER BY t.ch), '') AS m
      |         FROM u LEFT JOIN tch t ON u.user_id = t.user_id
      |         GROUP BY 1),
      |mu AS (SELECT mask.m, coalesce(cv.conv, 0) AS conv
      |       FROM mask LEFT JOIN cv ON mask.user_id = cv.user_id),
      |co AS (SELECT m,
      |         1000000 * CAST(sum(conv) AS BIGINT)
      |           // CAST(count(*) AS BIGINT) AS v_ppm
      |       FROM mu GROUP BY 1),
      |pairs(ch, s, su, w) AS (VALUES
      |  ('view',   '',             'view',              2),
      |  ('view',   'click',        'click,view',        1),
      |  ('view',   'signup',       'signup,view',       1),
      |  ('view',   'click,signup', 'click,signup,view', 2),
      |  ('click',  '',             'click',             2),
      |  ('click',  'signup',       'click,signup',      1),
      |  ('click',  'view',         'click,view',        1),
      |  ('click',  'signup,view',  'click,signup,view', 2),
      |  ('signup', '',             'signup',            2),
      |  ('signup', 'click',        'click,signup',      1),
      |  ('signup', 'view',         'signup,view',       1),
      |  ('signup', 'click,view',   'click,signup,view', 2)),
      |phi AS (SELECT p.ch AS channel,
      |          CAST(sum(p.w * (coalesce(vt.v_ppm, 0)
      |            - coalesce(vs.v_ppm, 0))) AS BIGINT) AS phi6
      |        FROM pairs p
      |        LEFT JOIN co vt ON p.su = vt.m
      |        LEFT JOIN co vs ON p.s = vs.m
      |        GROUP BY 1)
      |SELECT channel, phi6,
      |       CAST(round(phi6 / 6.0) AS BIGINT) AS shapley_ppm
      |FROM phi""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    val e = t(s, dir, "events")
    val tch = e.filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("event_type").as("ch")).distinct()
    val cv = e.filter(col("event_type") === "purchase")
      .select("user_id").distinct().withColumn("conv", lit(1L))
    val mask = e.select("user_id").distinct()
      .join(tch, Seq("user_id"), "left")
      .groupBy("user_id")
      .agg(concat_ws(",", sort_array(collect_set(col("ch")))).as("m"))
      .join(cv, Seq("user_id"), "left")
      .select(col("m"), coalesce(col("conv"), lit(0L)).as("conv"))
    val co = mask.groupBy("m")
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
      .select(col("m"), expr("1000000L * n_conv div n_users").as("v_ppm"))
    val pairs = Seq(
      ("view", "", "view", 2L),
      ("view", "click", "click,view", 1L),
      ("view", "signup", "signup,view", 1L),
      ("view", "click,signup", "click,signup,view", 2L),
      ("click", "", "click", 2L),
      ("click", "signup", "click,signup", 1L),
      ("click", "view", "click,view", 1L),
      ("click", "signup,view", "click,signup,view", 2L),
      ("signup", "", "signup", 2L),
      ("signup", "click", "click,signup", 1L),
      ("signup", "view", "signup,view", 1L),
      ("signup", "click,view", "click,signup,view", 2L))
      .toDF("ch", "s", "su", "w")
    pairs
      .join(broadcast(co.withColumnRenamed("m", "su")
        .withColumnRenamed("v_ppm", "v_t")), Seq("su"), "left")
      .join(broadcast(co.withColumnRenamed("m", "s")
        .withColumnRenamed("v_ppm", "v_s")), Seq("s"), "left")
      .groupBy(col("ch").as("channel"))
      .agg(sum(col("w") * (coalesce(col("v_t"), lit(0L))
        - coalesce(col("v_s"), lit(0L)))).as("phi6"))
      .select(col("channel"), col("phi6"),
        expr("CAST(round(phi6 / 6.0) AS BIGINT)").as("shapley_ppm"))
  }

  val all: Seq[Q] = Seq(lastTouch, linear, timeDecay, shapley)
}
