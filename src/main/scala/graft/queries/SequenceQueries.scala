package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Ranks
import graft.sources.Tables

/** Round-9 wave: ordered-event analytics over the `events` stream
  * table — the warehouse patterns that interrogate SEQUENCE, not just
  * totals: activity streaks (gaps-and-islands), conversion funnels
  * (ordered-step reachability), Markov transition matrices (lag
  * pairs), and cumulative distinct users (first-seen + global prefix
  * sum). The reference's analyzer answers "how much per day"
  * (Covid19Stats.java daily aggregates); these answer "in what order",
  * the natural next question of the same event stream.
  *
  * Scale shape: every window here partitions by `user_id` (or by a
  * histogram key) — per-key sorts, never a global ORDER BY window; the
  * one genuinely global ordering (q187's cumulative day series) runs
  * through [[Ranks.globalRunningSum]]'s two-phase range-partitioned
  * prefix sum, the q16/q150 machinery, so no single-partition window
  * appears anywhere in the wave (PlanSpec-asserted).
  */
object SequenceQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** q184: longest consecutive-day activity streak per user, rolled up
    * to a histogram — the classic GAPS-AND-ISLANDS: distinct active
    * days, island id = epoch-day − row_number (constant within a
    * consecutive run), island length = count, longest = max. The
    * user-partitioned window sorts each user's few hundred days
    * locally; nothing global. */
  val activityStreaks: Q = Q(
    "q184_activity_streaks",
    """WITH d AS (SELECT DISTINCT user_id,
      |                  CAST(date_trunc('day', ts) AS DATE) AS day
      |           FROM events),
      |r AS (SELECT user_id, day,
      |             (day - DATE '1970-01-01')
      |               - row_number() OVER (PARTITION BY user_id ORDER BY day)
      |               AS grp
      |      FROM d),
      |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len
      |      FROM r GROUP BY user_id, grp),
      |m AS (SELECT user_id, max(len) AS longest FROM s GROUP BY 1)
      |SELECT longest AS streak_days, CAST(count(*) AS BIGINT) AS n_users
      |FROM m GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val d = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val runs = d
      .withColumn("grp",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
          - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(max(col("len")).as("longest"))
    runs.groupBy(col("longest").as("streak_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** q185: three-step conversion funnel (view → click → purchase),
    * each step within 7 days of the previous — ordered-step
    * reachability via sequential earliest-timestamp joins (the
    * set-algebra funnel: step N's population is an equi-join of the
    * raw stream against step N−1's first-reach frame, all user-keyed
    * shuffles; no per-user sort, no window). One row: the three
    * population counts. */
  val eventFunnel: Q = Q(
    "q185_event_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t2
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click'
      |        AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 7 DAY
      |      GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t3
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase'
      |        AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 7 DAY
      |      GROUP BY 1)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
      |       (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
      |       (SELECT CAST(count(*) AS BIGINT) FROM p)
      |         AS n_view_click_purchase""".stripMargin
  ) { (s, dir) =>
    val (v, c, p) = funnelChain(t(s, dir, "events"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_view_click"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n_view_click_purchase"))))
  }

  /** The q185 first-reach chain shared with q203: (v, c, p) frames
    * with each user's first qualifying timestamp per stage (t1/t2/t3).
    * ONE implementation of the funnel contract (step names, 7-day
    * window, strict-after / within boundaries) so a rule change cannot
    * leave the latency view computing a different funnel than the
    * count view. */
  private def funnelChain(ev: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    def firstReach(prev: DataFrame, prevTs: String, step: String,
        outTs: String): DataFrame =
      ev.filter(col("event_type") === step)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(prevTs) &&
          col("ts") <= col(prevTs) + expr("INTERVAL 7 DAY"))
        .groupBy("user_id").agg(min(col("ts")).as(outTs))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = firstReach(v, "t1", "click", "t2")
    val p = firstReach(c, "t2", "purchase", "t3")
    (v, c, p)
  }

  /** q186: event-type transition matrix — consecutive (prev → next)
    * pairs per user in (ts, event_id) order via `lag` over the
    * user-partitioned window, with the transition probability in exact
    * integer ppm (floor-div: both engines share `div`-semantics on
    * positive longs, so no float crosses the oracle). The Markov view
    * of the stream a session-based recommender or anomaly detector
    * consumes. */
  val eventTransitions: Q = Q(
    "q186_event_transitions",
    """WITH l AS (SELECT user_id, event_type AS next_type,
      |                  lag(event_type) OVER (PARTITION BY user_id
      |                    ORDER BY ts, event_id) AS prev_type
      |           FROM events),
      |c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
      |      FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
      |      FROM c GROUP BY 1)
      |SELECT c.prev_type, c.next_type, c.n,
      |       CAST((1000000 * c.n) // t.tot AS BIGINT) AS p_ppm
      |FROM c JOIN t USING (prev_type)""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val c = t(s, dir, "events")
      .select(col("user_id"), col("event_type").as("next_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
    val tot = c.groupBy("prev_type").agg(sum(col("n")).as("tot"))
    c.join(broadcast(tot), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("(1000000 * n) div tot").as("p_ppm"))
  }

  /** q187: cumulative distinct users per day WITHOUT a distinct-over-
    * window (which would carry a per-day set): each user collapses to
    * their FIRST active day (one user-keyed aggregate), days roll up
    * new-user counts, and the running total is the q16/q150 two-phase
    * range-partitioned prefix sum — the pattern that turns "count
    * distinct so far" into linear work at any scale. */
  val cumulativeUsers: Q = Q(
    "q187_cumulative_users",
    """WITH f AS (SELECT user_id,
      |                  min(CAST(date_trunc('day', ts) AS DATE)) AS day
      |           FROM events GROUP BY 1),
      |nu AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
      |       FROM f GROUP BY 1),
      |days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
      |         FROM events)
      |SELECT d.day, coalesce(nu.new_users, 0) AS new_users,
      |       CAST(sum(coalesce(nu.new_users, 0)) OVER (ORDER BY d.day)
      |            AS BIGINT) AS cum_users
      |FROM days d LEFT JOIN nu USING (day)""".stripMargin
  ) { (s, dir) =>
    val ev = t(s, dir, "events")
    val nu = ev.groupBy("user_id").agg(min(to_date(col("ts"))).as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    val days = ev.select(to_date(col("ts")).as("day")).distinct()
    val joined = days.join(nu, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
    Ranks.globalRunningSum(joined, Seq(col("day").asc),
      col("new_users"), "cum_users")
      .select("day", "new_users", "cum_users")
  }

  /** q193: top session-opening paths — sessionize by 30-minute
    * inactivity gap (lag + running sum per user, the q35 rule), take
    * each session's first three events in (ts, event_id) order, and
    * census the resulting path strings. Session counts per opening
    * trigram are what funnel design and bot detection read first.
    * The collected triple is ordered DETERMINISTICALLY on both
    * engines: rank attaches before collection and the array sorts by
    * rank, never by collection order. */
  val sessionPaths: Q = Q(
    "q193_session_paths",
    """WITH o AS (SELECT user_id, event_type, ts, event_id,
      |                  epoch_us(ts) - lag(epoch_us(ts)) OVER
      |                    (PARTITION BY user_id ORDER BY ts, event_id)
      |                    AS gap_us
      |           FROM events),
      |s AS (SELECT user_id, event_type, ts, event_id,
      |             CAST(sum(CASE WHEN gap_us IS NULL
      |                            OR gap_us > 1800000000 THEN 1
      |                       ELSE 0 END) OVER
      |               (PARTITION BY user_id ORDER BY ts, event_id)
      |               AS BIGINT) AS sid
      |      FROM o),
      |r AS (SELECT user_id, sid, event_type,
      |             row_number() OVER (PARTITION BY user_id, sid
      |               ORDER BY ts, event_id) AS rn
      |      FROM s),
      |p AS (SELECT user_id, sid,
      |             array_to_string(list(event_type ORDER BY rn), '>') AS path
      |      FROM r WHERE rn <= 3 GROUP BY 1, 2)
      |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      |FROM p GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        (unix_micros(col("ts"))
          - lag(unix_micros(col("ts")), 1).over(wOrd)).as("gap_us"))
      .withColumn("sid",
        sum(when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1)
          .otherwise(0)).over(wOrd))
    val wSess = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    ev.withColumn("rn", row_number().over(wSess))
      .filter(col("rn") <= 3)
      .groupBy("user_id", "sid")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
  }

  /** q203: TIME-TO-CONVERT histogram — the follow-up question to
    * q185's funnel counts: of the users who completed view → click →
    * purchase, how long did the whole journey take? Reuses q185's
    * sequential first-reach chain (user-keyed equi-joins, no windows)
    * and buckets t3 − t1 into whole hours — exact integer floor-div of
    * the epoch-micros delta, so the histogram hash-oracles. */
  val funnelLatency: Q = Q(
    "q203_funnel_latency",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t2
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click'
      |        AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 7 DAY
      |      GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t3
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase'
      |        AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 7 DAY
      |      GROUP BY 1),
      |dt AS (SELECT p.user_id,
      |              (epoch_us(p.t3) - epoch_us(v.t1)) // 3600000000 AS hours
      |       FROM p JOIN v USING (user_id))
      |SELECT CAST(hours AS BIGINT) AS hours_to_convert,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM dt GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val (v, _, p) = funnelChain(t(s, dir, "events"))
    p.join(v, Seq("user_id"))
      // Column./ is DOUBLE division — `div` keeps the bucket id an
      // exact BIGINT like the oracle's `//`
      .select((unix_micros(col("t3")) - unix_micros(col("t1"))).as("dus"))
      .select(expr("dus div 3600000000").as("hours_to_convert"))
      .groupBy("hours_to_convert").agg(count(lit(1)).as("n_users"))
  }

  /** q204: DAU / rolling-7-day-AU stickiness per day — the product
    * metric a "distinct over a sliding window" naively computes with a
    * per-day set carry. Exact at scale instead: the DISTINCT
    * (user, day) table expands each row to the ≤7 window-end days it
    * supports (a bounded 7× fan-out of the already-collapsed day
    * grain, not of raw events), re-distincts (a user active twice
    * inside one window counts once), and counts — all exact integer
    * work, keyed shuffles only. Left-edge days keep their partial
    * windows, same on both engines. */
  val stickiness: Q = Q(
    "q204_stickiness",
    """WITH ud AS (SELECT DISTINCT user_id,
      |                   CAST(date_trunc('day', ts) AS DATE) AS day
      |            FROM events),
      |days AS (SELECT DISTINCT day FROM ud),
      |o AS (SELECT unnest(range(0, 7)) AS o),
      |ex AS (SELECT DISTINCT ud.user_id,
      |              ud.day + CAST(o.o AS INTEGER) AS day
      |       FROM ud CROSS JOIN o),
      |wau AS (SELECT ex.day, CAST(count(*) AS BIGINT) AS wau7
      |        FROM ex JOIN days ON days.day = ex.day GROUP BY 1),
      |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1)
      |SELECT dau.day, dau.dau, wau.wau7,
      |       (1000000 * dau.dau) // wau.wau7 AS stickiness_ppm
      |FROM dau JOIN wau USING (day)""".stripMargin
  ) { (s, dir) =>
    val ud = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .localCheckpoint(true) // day-grain, feeds dau + the window fan-out
    val days = ud.select("day").distinct()
    val offsets = s.range(0, 7).select(col("id").cast("int").as("o"))
    val ex = ud.crossJoin(broadcast(offsets))
      .select(col("user_id"), date_add(col("day"), col("o")).as("day"))
      .distinct()
    val wau = ex.join(broadcast(days), Seq("day"))
      .groupBy("day").agg(count(lit(1)).as("wau7"))
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau7"),
        expr("(1000000 * dau) div wau7").as("stickiness_ppm"))
  }

  /** q205: session BOUNCE RATE per day — share of sessions (q193's
    * 30-minute-gap rule) that contain a single event, keyed by the
    * session's start day. The engagement-quality number a traffic
    * dashboard pairs with q35's session lengths; exact integer ppm. */
  val bounceRate: Q = Q(
    "q205_bounce_rate",
    """WITH o AS (SELECT user_id, ts, event_id,
      |                  epoch_us(ts) - lag(epoch_us(ts)) OVER
      |                    (PARTITION BY user_id ORDER BY ts, event_id)
      |                    AS gap_us
      |           FROM events),
      |s AS (SELECT user_id, ts,
      |             CAST(sum(CASE WHEN gap_us IS NULL
      |                            OR gap_us > 1800000000 THEN 1
      |                       ELSE 0 END) OVER
      |               (PARTITION BY user_id ORDER BY ts, event_id)
      |               AS BIGINT) AS sid
      |      FROM o),
      |g AS (SELECT user_id, sid, min(ts) AS t0,
      |             CAST(count(*) AS BIGINT) AS nev
      |      FROM s GROUP BY 1, 2)
      |SELECT CAST(date_trunc('day', t0) AS DATE) AS day,
      |       CAST(count(*) AS BIGINT) AS n_sessions,
      |       CAST(sum(CASE WHEN nev = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_bounce,
      |       (1000000 * CAST(sum(CASE WHEN nev = 1 THEN 1 ELSE 0 END)
      |                       AS BIGINT)) // count(*) AS bounce_ppm
      |FROM g GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        (unix_micros(col("ts"))
          - lag(unix_micros(col("ts")), 1).over(wOrd)).as("gap_us"))
      .withColumn("sid",
        sum(when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1)
          .otherwise(0)).over(wOrd))
      .groupBy("user_id", "sid")
      .agg(min(col("ts")).as("t0"), count(lit(1)).as("nev"))
    sess.groupBy(to_date(col("t0")).as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("nev") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .select(col("day"), col("n_sessions"), col("n_bounce"),
        expr("(1000000 * n_bounce) div n_sessions").as("bounce_ppm"))
  }

  /** q227: WEEKDAY SEASONALITY PROFILE per event type — the "does
    * this metric breathe with the week?" companion of q196's ACF:
    * ACF detects that a weekly cycle exists; this measures its SHAPE
    * as a per-weekday index (1e6 = that weekday behaves like the
    * type's average day). Each weekday's rate normalizes by the
    * number of CALENDAR days of that weekday actually present in the
    * window (taken from the data, so a 30-day window's 4-vs-5
    * imbalance can't masquerade as seasonality). Counts and day
    * tallies are exact BIGINTs; the index is one final double
    * expression from them (never an integer product that could
    * overflow at corpus scale). Day-of-week is pinned to the
    * 0=Sunday..6 convention on both engines (Spark's dayofweek is
    * 1-based, DuckDB's 0-based — the Spark side subtracts 1).
    * Shape: one scan into two grouped counts and two dimension-sized
    * grids (7 weekdays, |types| rows) joined via broadcast. */
  val weekdayProfile: Q = Q(
    "q227_weekday_profile",
    """WITH e AS (SELECT event_type,
      |                  CAST(date_trunc('day', ts) AS DATE) AS day,
      |                  CAST(dayofweek(ts) AS BIGINT) AS dow
      |           FROM events),
      |days AS (SELECT dow, CAST(count(DISTINCT day) AS BIGINT) AS n_days
      |         FROM (SELECT DISTINCT day, dow FROM e) GROUP BY dow),
      |cal AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS total_days
      |        FROM e),
      |c AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_events
      |      FROM e GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS total
      |        FROM e GROUP BY 1)
      |SELECT c.event_type, c.dow, c.n_events, days.n_days,
      |       CAST(round(CAST(c.n_events AS DOUBLE) * cal.total_days
      |           / (CAST(days.n_days AS DOUBLE) * tot.total) * 1000000)
      |         AS BIGINT) AS idx_ppm
      |FROM c JOIN days USING (dow) JOIN tot USING (event_type)
      |CROSS JOIN cal""".stripMargin
  ) { (s, dir) =>
    val e = t(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (dayofweek(col("ts")) - 1).cast(LongType).as("dow"))
    val days = e.select("day", "dow").distinct()
      .groupBy("dow").agg(count(lit(1)).as("n_days"))
    val cal = e.select("day").distinct()
      .agg(count(lit(1)).as("total_days"))
    val c = e.groupBy("event_type", "dow").agg(count(lit(1)).as("n_events"))
    val tot = e.groupBy("event_type").agg(count(lit(1)).as("total"))
    c.join(broadcast(days), Seq("dow"))
      .join(broadcast(tot), Seq("event_type"))
      .crossJoin(broadcast(cal))
      .select(col("event_type"), col("dow"), col("n_events"), col("n_days"),
        round(col("n_events").cast("double") * col("total_days")
            / (col("n_days").cast("double") * col("total")) * 1000000)
          .cast(LongType).as("idx_ppm"))
  }

  /** q237: WEEKLY COHORT RETENTION MATRIX — users bucketed by
    * first-seen week, each cohort's share still active N weeks later,
    * the canonical product-health triangle (q204's stickiness is one
    * scalar of it; this is the full surface). Week indexing is pure
    * integer day arithmetic from the corpus' own first activity day
    * (a broadcast 1-row global — no engine-specific week-truncation
    * semantics to disagree on), retention is integral-floor ppm, and
    * week 0 is the cohort size BY CONSTRUCTION (a user's first day is
    * in their own cohort week), so the denominator row always exists.
    *
    * Scale shape: distinct (user, day) grain first (one combinable
    * aggregation), per-user first day second, an equi-join back on
    * user_id, then a (cohort, week) rollup — counts cross the wire at
    * user-day grain, the matrix is calendar² rows. No window. */
  val cohortRetention: Q = Q(
    "q237_cohort_retention",
    """WITH u AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |           FROM events),
      |f AS (SELECT user_id, min(day) AS first_day FROM u GROUP BY 1),
      |g AS (SELECT min(first_day) AS day0 FROM f),
      |r AS (SELECT CAST(date_diff('day', g.day0, f.first_day) // 7
      |               AS BIGINT) AS cohort_w,
      |             CAST(date_diff('day', f.first_day, u.day) // 7
      |               AS BIGINT) AS week_n,
      |             u.user_id
      |      FROM u JOIN f USING (user_id) CROSS JOIN g),
      |c AS (SELECT cohort_w, week_n,
      |             CAST(count(DISTINCT user_id) AS BIGINT) AS active
      |      FROM r GROUP BY 1, 2),
      |s AS (SELECT cohort_w, active AS cohort_size FROM c WHERE week_n = 0)
      |SELECT c.cohort_w, c.week_n, c.active, s.cohort_size,
      |       (1000000 * c.active) // s.cohort_size AS retained_ppm
      |FROM c JOIN s USING (cohort_w)""".stripMargin
  ) { (s, dir) =>
    val u = t(s, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val f = u.groupBy("user_id").agg(min(col("day")).as("first_day"))
    val g = f.agg(min(col("first_day")).as("day0"))
    val r = u.join(f, Seq("user_id")).crossJoin(broadcast(g))
      .select(
        expr("datediff(first_day, day0) div 7").as("cohort_w"),
        expr("datediff(day, first_day) div 7").as("week_n"),
        col("user_id"))
    val c = r.groupBy("cohort_w", "week_n")
      .agg(countDistinct(col("user_id")).as("active"))
    val sizes = c.filter(col("week_n") === 0)
      .select(col("cohort_w"), col("active").as("cohort_size"))
    c.join(broadcast(sizes), Seq("cohort_w"))
      .select(col("cohort_w"), col("week_n"), col("active"),
        col("cohort_size"),
        expr("(1000000 * active) div cohort_size").as("retained_ppm"))
  }

  /** q243: SEASONALLY ADJUSTED daily series — q227's weekday index
    * APPLIED: each (type, day) count divided by its weekday's index so
    * a Sunday dip stops masquerading as an anomaly (the pre-pass
    * q131/q144's detectors want on weekly-seasonal traffic). Fully
    * integer-exact — the index's rational form cancels into one
    * integral floor division of DECIMAL(38,0)/HUGEINT products:
    * adj_ppm = 10⁶·c·n_days(dow)·total(type) div (n_dow(type,dow)·
    * total_days) — no rounding anywhere, stronger than q227's own
    * ppm rendering. Dimension-sized index tables broadcast onto the
    * (type, day) grain; no window. */
  val seasonalAdjusted: Q = Q(
    "q243_seasonal_adjusted",
    """WITH e AS (SELECT event_type,
      |                  CAST(date_trunc('day', ts) AS DATE) AS day,
      |                  CAST(dayofweek(ts) AS BIGINT) AS dow
      |           FROM events),
      |c AS (SELECT event_type, day, dow, CAST(count(*) AS BIGINT) AS c
      |      FROM e GROUP BY 1, 2, 3),
      |days AS (SELECT dow, CAST(count(DISTINCT day) AS BIGINT) AS n_days
      |         FROM (SELECT DISTINCT day, dow FROM e) GROUP BY dow),
      |cal AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS total_days
      |        FROM e),
      |dowc AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_dow
      |         FROM e GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS total
      |        FROM e GROUP BY 1)
      |SELECT c.event_type, c.day, c.c,
      |       CAST((1000000 * CAST(c.c AS HUGEINT) * days.n_days * tot.total)
      |            // (CAST(dowc.n_dow AS HUGEINT) * cal.total_days)
      |         AS BIGINT) AS adj_ppm
      |FROM c JOIN days USING (dow)
      |JOIN dowc ON dowc.event_type = c.event_type AND dowc.dow = c.dow
      |JOIN tot ON tot.event_type = c.event_type
      |CROSS JOIN cal""".stripMargin
  ) { (s, dir) =>
    val e = t(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (dayofweek(col("ts")) - 1).cast(LongType).as("dow"))
    val c = e.groupBy("event_type", "day", "dow")
      .agg(count(lit(1)).as("c"))
    val days = e.select("day", "dow").distinct()
      .groupBy("dow").agg(count(lit(1)).as("n_days"))
    val cal = e.select("day").distinct().agg(count(lit(1)).as("total_days"))
    val dowc = e.groupBy("event_type", "dow").agg(count(lit(1)).as("n_dow"))
    val tot = e.groupBy("event_type").agg(count(lit(1)).as("total"))
    c.join(broadcast(days), Seq("dow"))
      .join(broadcast(dowc), Seq("event_type", "dow"))
      .join(broadcast(tot), Seq("event_type"))
      .crossJoin(broadcast(cal))
      .select(col("event_type"), col("day"), col("c"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * c * n_days * total)" +
          " DIV (CAST(n_dow AS DECIMAL(38,0)) * total_days) AS BIGINT)")
          .as("adj_ppm"))
  }

  /** q244: ANY-ORDER SET COMPLETION — users who performed ALL THREE of
    * view/click/purchase in any order, histogrammed by the days
    * between their first and last FIRST-occurrence (q185's ordered
    * funnel misses the browse-after-buy path; task-completion
    * analyses want the unordered form). One conditional-min
    * aggregation per user (no pivot shuffle beyond the user rollup),
    * exact day arithmetic on first-occurrence timestamps. */
  val setCompletion: Q = Q(
    "q244_set_completion",
    """WITH f AS (SELECT user_id,
      |             min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
      |             min(CASE WHEN event_type = 'click' THEN ts END) AS tc,
      |             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      |           FROM events
      |           WHERE event_type IN ('view', 'click', 'purchase')
      |           GROUP BY 1),
      |d AS (SELECT user_id,
      |        date_diff('day', CAST(least(tv, tc, tp) AS DATE),
      |          CAST(greatest(tv, tc, tp) AS DATE)) AS days_to_complete
      |      FROM f
      |      WHERE tv IS NOT NULL AND tc IS NOT NULL AND tp IS NOT NULL)
      |SELECT CAST(days_to_complete AS BIGINT) AS days_to_complete,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM d GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("tv"),
        min(when(col("event_type") === "click", col("ts"))).as("tc"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
      .filter(col("tv").isNotNull && col("tc").isNotNull &&
        col("tp").isNotNull)
      .select(datediff(
        to_date(greatest(col("tv"), col("tc"), col("tp"))),
        to_date(least(col("tv"), col("tc"), col("tp"))))
        .cast(LongType).as("days_to_complete"))
      .groupBy("days_to_complete").agg(count(lit(1)).as("n_users"))
  }

  /** q250: REPEAT-PURCHASE CADENCE — the histogram of whole-day gaps
    * between each user's consecutive purchases, the reorder-cycle
    * number replenishment and retention models key on (q203 measures
    * the funnel's first view→purchase latency; this measures the
    * purchase→purchase rhythm of users who came back). The
    * consecutive-pair lag rides a USER-keyed window ((user, ts,
    * event_id) total order — the q138 transition-lag discipline,
    * never a global sort); gaps are exact integer day arithmetic on
    * epoch-microsecond timestamps. */
  val purchaseCadence: Q = Q(
    "q250_purchase_cadence",
    """WITH p AS (SELECT user_id, ts, event_id FROM events
      |           WHERE event_type = 'purchase'),
      |g AS (SELECT user_id,
      |        date_diff('day',
      |          CAST(lag(ts) OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS DATE),
      |          CAST(ts AS DATE)) AS gap_days
      |      FROM p)
      |SELECT CAST(gap_days AS BIGINT) AS gap_days,
      |       CAST(count(*) AS BIGINT) AS n_pairs,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM g WHERE gap_days IS NOT NULL
      |GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_days",
        datediff(col("ts").cast("date"), lag(col("ts"), 1).over(w)
          .cast("date")).cast(LongType))
      .filter(col("gap_days").isNotNull)
      .groupBy("gap_days")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** q253: INTER-ARRIVAL BURSTINESS per user — mean gap, coefficient
    * of variation, and the Goh-Barabási burstiness index
    * B = (σ−μ)/(σ+μ) (−1 = perfectly regular, 0 = Poisson, →1 =
    * bursty) over the microsecond gaps between a user's consecutive
    * events. q242's Fano factor reads burstiness at DAY-COUNT grain;
    * this reads the raw inter-event process — the number that decides
    * whether per-user rate limits or session timeouts make sense.
    *
    * Exactness: gaps are exact epoch-µs BIGINTs from a user-keyed lag
    * window ordered by (ts, event_id) (total per user); n/Σg/Σg² are
    * exact (DECIMAL(38,0)/HUGEINT for the squares); σ and the two
    * ratios are ONE fixed IEEE expression over those integers per row
    * (the q242 shape), reported in milli. Population σ (n
    * denominator); users need ≥ 2 gaps. */
  val interarrivalBurstiness: Q = Q(
    "q253_interarrival_burstiness",
    """WITH g AS (
      |  SELECT user_id,
      |         epoch_us(ts) - lag(epoch_us(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      |  FROM events),
      |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(gap) AS BIGINT) AS s,
      |        sum(CAST(gap AS HUGEINT) * gap) AS ss
      |      FROM g WHERE gap IS NOT NULL GROUP BY 1
      |      HAVING count(*) >= 2)
      |SELECT user_id, n, s // n AS mean_us,
      |       CAST(round(1000.0
      |         * sqrt(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
      |                - CAST(s AS DOUBLE) * s) / s) AS BIGINT) AS cv_milli,
      |       CAST(round(1000.0
      |         * (sqrt(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
      |                 - CAST(s AS DOUBLE) * s) - CAST(s AS DOUBLE))
      |         / (sqrt(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
      |                 - CAST(s AS DOUBLE) * s) + CAST(s AS DOUBLE)))
      |         AS BIGINT) AS burstiness_milli
      |FROM m""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val nD = col("n").cast("double")
    val sD = col("s").cast("double")
    val x = nD * col("ss").cast("double") - sD * col("s")
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("gap")).as("s"),
        sum(col("gap").cast("decimal(38,0)") * col("gap")).as("ss"))
      .filter(col("n") >= 2)
      .select(col("user_id"), col("n"), expr("s div n").as("mean_us"),
        round(lit(1000.0) * sqrt(x) / col("s")).cast(LongType).as("cv_milli"),
        round(lit(1000.0) * (sqrt(x) - sD) / (sqrt(x) + sD))
          .cast(LongType).as("burstiness_milli"))
  }

  /** q256: TRANSITION ENTROPY per event type — H(next | cur = a) =
    * −Σ_b p(b|a)·ln p(b|a) over the exact consecutive-pair counts, the
    * predictability scalar on top of q186's transition matrix (a type
    * whose successors are near-deterministic reads ≈ 0; one whose
    * successors are uniform reads ln(#types)). Pairs come from a
    * user-keyed lead window ordered by (ts, event_id) — per-user
    * sorts, never global; cell counts are dimension-sized (types²);
    * margins broadcast back; per-cell terms micro-quantize to u6
    * before the order-immune sum (the q241/q252 technique). */
  val transitionEntropy: Q = Q(
    "q256_transition_entropy",
    """WITH e AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS nxt
      |  FROM events),
      |c AS (SELECT event_type, nxt, CAST(count(*) AS BIGINT) AS n_ab
      |      FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |m AS (SELECT event_type, CAST(sum(n_ab) AS BIGINT) AS n_a
      |      FROM c GROUP BY 1)
      |SELECT c.event_type, m.n_a,
      |       CAST(sum(CAST(round(-1000000.0
      |         * (CAST(n_ab AS DOUBLE) / m.n_a)
      |         * ln(CAST(n_ab AS DOUBLE) / m.n_a)) AS BIGINT)) AS BIGINT)
      |         AS h_u6
      |FROM c JOIN m USING (event_type)
      |GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cells = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy("event_type", "nxt").agg(count(lit(1)).as("n_ab"))
    val margins = cells.groupBy("event_type").agg(sum(col("n_ab")).as("n_a"))
    cells.join(broadcast(margins), Seq("event_type"))
      .select(col("event_type"), col("n_a"),
        round(lit(-1000000.0)
          * (col("n_ab").cast("double") / col("n_a"))
          * log(col("n_ab").cast("double") / col("n_a")))
          .cast(LongType).as("term_u6"))
      .groupBy("event_type", "n_a").agg(sum(col("term_u6")).as("h_u6"))
  }

  /** q261: STATIONARY DISTRIBUTION of the event-type Markov chain —
    * where q256 reads the per-state uncertainty of the transition
    * matrix and q138/q186 its hottest cells, this reads its long-run
    * equilibrium ("what share of a steady session stream sits in each
    * state"), the PageRank-without-teleport of the behavioral graph.
    * Method: 12 synchronized power-iteration steps from the uniform
    * vector, every quantity an exact integer — P in ppm by floor
    * division (both engines floor), and each step
    * v'(j) = ⌊Σ_i v(i)·P_ppm(i,j) / 10⁶⌋ with v ≤ 10⁶, P ≤ 10⁶,
    * ≤ 37 terms ⇒ the accumulator tops out near 3.7·10¹³, far inside
    * BIGINT; identical floors on both engines make 12 iterations
    * bit-reproducible (the iteration-in-SQL oracle is UNROLLED — 12
    * mechanically generated CTEs — because recursive CTEs cannot
    * aggregate portably).
    *
    * Scale shape: the corpus is touched ONCE (the q256 lag-window
    * pass) to build the type-grain matrix, which is localCheckpointed
    * at ≤ |types|² rows; every iteration is then a broadcast join of
    * kilobyte frames, so the iteration cost is independent of corpus
    * size — the same reason q124's PageRank iterates on the
    * aggregated edge table, never the raw events. */
  val markovStationary: Q = {
    val unrolled = (1 to 12).map { i =>
      s"""v$i AS (SELECT p.dst AS t,
         |  CAST(sum(v${i - 1}.v * p.p_ppm) // 1000000 AS BIGINT) AS v
         |  FROM v${i - 1} JOIN p ON v${i - 1}.t = p.src GROUP BY 1)"""
        .stripMargin
    }.mkString(",\n")
    Q(
      "q261_markov_stationary",
      s"""WITH e AS (
         |  SELECT user_id, event_type,
         |         lead(event_type) OVER (PARTITION BY user_id
         |                                ORDER BY ts, event_id) AS nxt
         |  FROM events),
         |c AS (SELECT event_type AS src, nxt AS dst,
         |             CAST(count(*) AS BIGINT) AS n
         |      FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |m AS (SELECT src, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
         |p AS (SELECT c.src, c.dst, 1000000 * c.n // m.tot AS p_ppm
         |      FROM c JOIN m USING (src)),
         |t0 AS (SELECT DISTINCT src AS t FROM p),
         |v0 AS (SELECT t, 1000000 // (SELECT count(*) FROM t0) AS v FROM t0),
         |$unrolled
         |SELECT t AS event_type, v AS stationary_ppm FROM v12""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cells = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("n"))
      val margins = cells.groupBy("src").agg(sum(col("n")).as("tot"))
      // type-grain matrix, materialized once: iterations never re-scan events
      val p = cells.join(broadcast(margins), Seq("src"))
        .select(col("src"), col("dst"),
          expr("1000000L * n div tot").as("p_ppm"))
        .localCheckpoint(true)
      val t0 = p.select(col("src").as("t")).distinct()
      var v = t0.crossJoin(broadcast(t0.agg(count(lit(1)).as("nt"))))
        .select(col("t"), expr("1000000L div nt").as("v"))
      for (_ <- 1 to 12) {
        v = v.join(broadcast(p), col("t") === col("src"))
          .groupBy(col("dst"))
          .agg(expr("CAST(sum(v * p_ppm) div 1000000 AS BIGINT)").as("v"))
          .withColumnRenamed("dst", "t")
      }
      v.select(col("t").as("event_type"), col("v").as("stationary_ppm"))
    }
  }

  /** q281: ENTROPY RATE of the behavioral Markov chain — the one
    * number summarizing how predictable a session stream is in the
    * long run: H = Σᵢ π(i)·H(i), q261's stationary distribution
    * weighting q256's per-state transition entropies. (Uniform
    * weighting would overstate rare states; the entropy RATE weights
    * each state by how often the chain actually sits there.) Pure
    * composition: both inputs are already exact integers (π in ppm
    * from the 12 floor-divided power iterations, H(i) in micro-nats
    * from the micro-quantized terms), so the product sum is one more
    * exact integer — Σ π_ppm·h_u6 // 10⁶ keeps micro-nat units, every
    * floor identical on both engines. Output also carries the naive
    * uniform average for contrast.
    *
    * Scale: one corpus pass builds the matrix (shared shape with
    * q256/q261); everything after runs at type grain. */
  val entropyRate: Q = {
    val unrolled = (1 to 12).map { i =>
      s"""v$i AS (SELECT p.dst AS t,
         |  CAST(sum(v${i - 1}.v * p.p_ppm) // 1000000 AS BIGINT) AS v
         |  FROM v${i - 1} JOIN p ON v${i - 1}.t = p.src GROUP BY 1)"""
        .stripMargin
    }.mkString(",\n")
    Q(
      "q281_entropy_rate",
      s"""WITH e AS (
         |  SELECT user_id, event_type,
         |         lead(event_type) OVER (PARTITION BY user_id
         |                                ORDER BY ts, event_id) AS nxt
         |  FROM events),
         |c AS (SELECT event_type AS src, nxt AS dst,
         |             CAST(count(*) AS BIGINT) AS n
         |      FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |m AS (SELECT src, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
         |p AS (SELECT c.src, c.dst, 1000000 * c.n // m.tot AS p_ppm
         |      FROM c JOIN m USING (src)),
         |t0 AS (SELECT DISTINCT src AS t FROM p),
         |v0 AS (SELECT t, 1000000 // (SELECT count(*) FROM t0) AS v FROM t0),
         |$unrolled,
         |h AS (SELECT c.src AS t,
         |        CAST(sum(CAST(round(-1000000.0
         |          * (CAST(c.n AS DOUBLE) / m.tot)
         |          * ln(CAST(c.n AS DOUBLE) / m.tot)) AS BIGINT)) AS BIGINT)
         |          AS h_u6
         |      FROM c JOIN m USING (src) GROUP BY 1)
         |SELECT CAST(sum(v12.v * h.h_u6) // 1000000 AS BIGINT)
         |         AS entropy_rate_u6,
         |       CAST(sum(h.h_u6) // count(*) AS BIGINT) AS uniform_avg_u6,
         |       CAST(count(*) AS BIGINT) AS n_states
         |FROM v12 JOIN h USING (t)""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cells = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // one corpus pass feeds P, pi, and H
      val margins = cells.groupBy("src").agg(sum(col("n")).as("tot"))
      val p = cells.join(broadcast(margins), Seq("src"))
        .select(col("src"), col("dst"),
          expr("1000000L * n div tot").as("p_ppm"))
        .localCheckpoint(true)
      val t0 = p.select(col("src").as("t")).distinct()
      var v = t0.crossJoin(broadcast(t0.agg(count(lit(1)).as("nt"))))
        .select(col("t"), expr("1000000L div nt").as("v"))
      for (_ <- 1 to 12) {
        v = v.join(broadcast(p), col("t") === col("src"))
          .groupBy(col("dst"))
          .agg(expr("CAST(sum(v * p_ppm) div 1000000 AS BIGINT)").as("v"))
          .withColumnRenamed("dst", "t")
      }
      val h = cells.join(broadcast(margins), Seq("src"))
        .select(col("src").as("t"),
          round(lit(-1000000.0)
            * (col("n").cast("double") / col("tot"))
            * log(col("n").cast("double") / col("tot")))
            .cast(LongType).as("term_u6"))
        .groupBy("t").agg(sum(col("term_u6")).as("h_u6"))
      v.join(h, Seq("t"))
        .agg(expr("CAST(sum(v * h_u6) div 1000000 AS BIGINT)")
          .as("entropy_rate_u6"),
          expr("CAST(sum(h_u6) div count(1) AS BIGINT)").as("uniform_avg_u6"),
          count(lit(1)).as("n_states"))
    }
  }

  /** q291: MAXIMUM DRAWDOWN of each type's daily-volume series — the
    * peak-to-trough collapse depth (how far below its historical best
    * day a stream has fallen, at the worst point so far), the
    * risk-style reading the level family (q141 EWMA, q144 MAD, q197
    * CUSUM) doesn't give: CUSUM finds WHERE the level shifted, max
    * drawdown says HOW DEEP the worst sustained drop cut relative to
    * the running peak. Exact integer cents end to end: daily revenue
    * in cents (the DECIMAL-internally / BIGINT-out discipline), a
    * type-KEYED running max (day order), dd_d = runmax_d − x_d, and
    * one max per type. One shuffle at (type, day) grain, one keyed
    * window over the day-grain series — never a partition-less
    * window. */
  val maxDrawdown: Q = Q(
    "q291_max_drawdown",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |             CAST(sum(CAST(round(value * 100) AS BIGINT))
      |               AS BIGINT) AS cents
      |           FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, day, cents,
      |        CAST(max(cents) OVER (PARTITION BY event_type
      |          ORDER BY day) AS BIGINT) AS runpeak
      |      FROM d)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |       CAST(max(runpeak) AS BIGINT) AS peak_cents,
      |       CAST(max(runpeak - cents) AS BIGINT) AS max_dd_cents,
      |       CAST((1000 * max(runpeak - cents)) // max(runpeak)
      |         AS BIGINT) AS max_dd_milli
      |FROM r GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val d = t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    val w = Window.partitionBy("event_type").orderBy("day")
    d.withColumn("runpeak", max(col("cents")).over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        max(col("runpeak")).as("peak_cents"),
        max(col("runpeak") - col("cents")).as("max_dd_cents"))
      .select(col("event_type"), col("n_days"), col("peak_cents"),
        col("max_dd_cents"),
        expr("(1000 * max_dd_cents) div peak_cents").as("max_dd_milli"))
  }

  /** q300: WEEK-OVER-WEEK TOP-10 RANK CHURN of the user leaderboard —
    * the TEMPORAL stability reading q268's RBO (two rankers, one
    * moment) doesn't give: how much of this week's top-10 was in last
    * week's (dashboard turnover, anomaly smell when it spikes).
    * Per week: top-10 users by event count ((count desc, user asc)
    * total order — deterministic); consecutive weeks join on the
    * 7-day step; overlap and Jaccard are exact set integers off ONE
    * aggregated week×user frame. The rank window is week-KEYED over
    * week×user grain; week pairs join broadcast-small (weeks × 10
    * rows). */
  val rankChurn: Q = Q(
    "q300_rank_churn",
    """WITH wu AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
      |             user_id, CAST(count(*) AS BIGINT) AS n
      |           FROM events GROUP BY 1, 2),
      |rk AS (SELECT wk, user_id,
      |         row_number() OVER (PARTITION BY wk
      |           ORDER BY n DESC, user_id ASC) AS r
      |       FROM wu),
      |top AS (SELECT wk, user_id FROM rk WHERE r <= 10),
      |sz AS (SELECT wk, CAST(count(*) AS BIGINT) AS sz
      |       FROM top GROUP BY 1),
      |ov AS (SELECT b.wk AS week,
      |         CAST(count(*) AS BIGINT) AS overlap
      |       FROM top a JOIN top b
      |         ON b.wk = a.wk + 7 AND b.user_id = a.user_id
      |       GROUP BY 1)
      |SELECT cur.wk AS week, coalesce(ov.overlap, 0) AS overlap,
      |       (1000000 * coalesce(ov.overlap, 0))
      |         // (prev.sz + cur.sz - coalesce(ov.overlap, 0))
      |         AS jaccard_ppm
      |FROM sz cur JOIN sz prev ON cur.wk = prev.wk + 7
      |LEFT JOIN ov ON ov.week = cur.wk""".stripMargin
  ) { (s, dir) =>
    val wu = t(s, dir, "events")
      .groupBy(expr("CAST(date_trunc('week', ts) AS DATE)").as("wk"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("wk").orderBy(col("n").desc, col("user_id"))
    val top = wu.withColumn("r", row_number().over(w))
      .filter(col("r") <= 10).select("wk", "user_id")
      .localCheckpoint(true) // weeks × 10 rows; reused on three sides
    val ov = top.as("a")
      .join(top.as("b"),
        expr("b.wk = date_add(a.wk, 7) AND b.user_id = a.user_id"))
      .groupBy(col("b.wk").as("week"))
      .agg(count(lit(1)).as("overlap"))
    val sz = top.groupBy("wk").agg(count(lit(1)).as("sz"))
    // Jaccard over the ACTUAL set sizes (top-10 sets shrink when a
    // week has fewer than 10 active users at small scale factors)
    sz.as("cur")
      .join(sz.select(col("wk").as("pw"), col("sz").as("psz")).as("prev"),
        expr("cur.wk = date_add(pw, 7)"))
      .join(ov, col("cur.wk") === col("week"), "left")
      .select(col("cur.wk").as("week"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        expr("(1000000 * coalesce(overlap, 0L)) " +
          "div (psz + sz - coalesce(overlap, 0L))").as("jaccard_ppm"))
  }

  /** q301: CALENDAR COVERAGE + GAP PROFILE per type — the ingest
    * data-quality readout q85's gap-fill silently repairs but nothing
    * REPORTS: how much of each type's active span actually has data,
    * and how long the worst outage ran. Exact day arithmetic: span =
    * last−first+1, coverage = observed/span ppm, max gap from a
    * type-keyed lag over the observed-day sequence (0 when the span
    * is dense). Day grain end to end. */
  val coverageGaps: Q = Q(
    "q301_coverage_gaps",
    """WITH d AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day
      |           FROM events),
      |g AS (SELECT event_type, day,
      |        date_diff('day',
      |          lag(day) OVER (PARTITION BY event_type ORDER BY day),
      |          day) - 1 AS gap
      |      FROM d)
      |SELECT event_type,
      |       CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT)
      |         AS span_days,
      |       CAST(count(*) AS BIGINT) AS observed_days,
      |       (1000000 * CAST(count(*) AS BIGINT))
      |         // CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT)
      |         AS coverage_ppm,
      |       CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_days
      |FROM g GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val d = t(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy("event_type").orderBy("day")
    d.withColumn("gap",
        (datediff(col("day"), lag(col("day"), 1).over(w)) - 1).cast("long"))
      .groupBy("event_type")
      .agg((datediff(max(col("day")), min(col("day"))) + 1).cast("long")
          .as("span_days"),
        count(lit(1)).as("observed_days"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap_days"))
      .select(col("event_type"), col("span_days"), col("observed_days"),
        expr("(1000000 * observed_days) div span_days").as("coverage_ppm"),
        col("max_gap_days"))
  }

  val all: Seq[Q] =
    Seq(activityStreaks, eventFunnel, eventTransitions, cumulativeUsers,
      sessionPaths, funnelLatency, stickiness, bounceRate, weekdayProfile,
      cohortRetention, seasonalAdjusted, setCompletion, purchaseCadence,
      interarrivalBurstiness, transitionEntropy, markovStationary,
      entropyRate, maxDrawdown, rankChurn, coverageGaps)
}
