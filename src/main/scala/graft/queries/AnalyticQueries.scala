package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.sources.Tables

/** The reference's analytic/serving surface (SURVEY.md §2.4-§2.7, §3.2,
  * §3.3): moving averages, pivots, grand totals, positional zip join,
  * preference-array fanout join, TTL dedup, rendering, set ops, ranking.
  */
object AnalyticQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val dec = DecimalType(18, 2)

  /** A6/W5 — frame-based moving mean (5 observations), the reference's
    * DescriptiveStatistics(5) positivity-rate average
    * (Visualizer.java:298-319). Determinism: frame sum is DECIMAL
    * (exact), single double division at the end. */
  val movingAvg: Q = Q(
    "q13_moving_avg",
    """WITH d AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
      |  FROM events GROUP BY 1, 2)
      |SELECT day, event_type, CAST(total AS DOUBLE) AS total,
      |       CAST(sum(total) OVER w AS DOUBLE) / count(*) OVER w AS ma5
      |FROM d
      |WINDOW w AS (PARTITION BY event_type ORDER BY day
      |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin
  ) { (s, dir) =>
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      // Decimal accumulation (order-independent); the window frame sums
      // decimals too — only the OUTPUT representation is double (the
      // driver hash rejects any decimal-typed output column).
      .agg(sum(col("value").cast(dec)).cast(dec).as("total"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-4, 0)
    daily.withColumn("ma5",
      sum(col("total")).over(w).cast("double") / count(lit(1)).over(w))
      .select(col("day"), col("event_type"),
        col("total").cast("double").as("total"), col("ma5"))
  }

  /** §3.3 — pivot-by-key time series (Visualizer.java:217-231 builds
    * state→series maps by hand; Spark's groupBy().pivot() is the native
    * form). Absent combinations stay NULL in both engines (sum of empty). */
  val pivotSeries: Q = Q(
    "q14_pivot_series",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click')    AS DOUBLE) AS click,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'view')     AS DOUBLE) AS view,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'signup')   AS DOUBLE) AS signup,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'error')    AS DOUBLE) AS error
      |FROM events GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val types = Seq("click", "view", "purchase", "signup", "error")
    t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(sum(col("value").cast(dec)))
      .select(col("day") +: types.map(c => col(c).cast("double").as(c)): _*)
  }

  /** A7 — grand-total pseudo-key via rollup (bot/BotUtils.java:293-318
    * renders a "Total" row; the reference trusts an upstream Total row,
    * we compute it). */
  val rollupTotal: Q = Q(
    "q15_rollup_total",
    """SELECT coalesce(event_type, 'Total') AS event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY ROLLUP(event_type)""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "events")
      .rollup(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value").cast(dec)).cast("double").as("sum_value"))
      .select(coalesce(col("event_type"), lit("Total")).as("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** J4 — positional zip join (Utils.java:17-28 pairs i-th delta with
    * i-th daily): rank both sides, equi-join on rank. Both ranks are
    * two-phase partitioned ranks (Ranks.globalRowNumber) — no
    * single-partition global window, so the operator survives sides far
    * larger than the reference's 39-state zip. */
  val zipJoin: Q = Q(
    "q16_zip_join",
    """WITH c AS (SELECT c_name, c_acctbal,
      |             row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn
      |           FROM customer),
      |s AS (SELECT s_name, s_acctbal,
      |        row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rn
      |      FROM supplier)
      |SELECT c.rn AS rn, c_name, c_acctbal, s_name, s_acctbal
      |FROM c JOIN s USING (rn)""".stripMargin
  ) { (s, dir) =>
    import graft.operators.Ranks
    val c = Ranks.globalRowNumber(t(s, dir, "customer"),
      Seq(col("c_acctbal").desc, col("c_custkey")), "rn")
    val sup = Ranks.globalRowNumber(t(s, dir, "supplier"),
      Seq(col("s_acctbal").desc, col("s_suppkey")), "rn")
    c.join(sup, Seq("rn"))
      .select("rn", "c_name", "c_acctbal", "s_name", "s_acctbal")
  }

  /** J2/P6 — per-user preference fanout: user's preference array matched
    * against incoming keys (bot KafkaStreamsConfig.java:164-188 scans
    * prefs per alert; Spark-first form is explode + equi-join, which
    * scales where a crossJoin+array_contains would not). */
  val prefsArrayJoin: Q = Q(
    "q17_prefs_array_join",
    """SELECT o_orderpriority AS priority,
      |       count(DISTINCT o_custkey) AS n_subscribers
      |FROM orders GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(collect_set(col("o_orderpriority")).as("prefs"))
      .select(explode(col("prefs")).as("priority"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_subscribers"))
  }

  /** ST3 — dedup-with-TTL-refresh, batch analog: an event within TTL of
    * the previous event of its key is a duplicate AND extends the TTL
    * (DeduplicationTransformer.java:62-86); survivors are exactly the
    * chain starters (gap > TTL). TTL here: 1 day. */
  val dedupTtl: Q = Q(
    "q18_dedup_ttl",
    """SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |         lag(epoch_ns(ts)) OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS prev_ns
      |  FROM events) t
      |WHERE prev_ns IS NULL OR epoch_ns(ts) - prev_ns > 86400000000000""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    t(s, dir, "events")
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
      .filter(col("prev_ns").isNull ||
        col("ts_ns") - col("prev_ns") > lit(86400000000000L))
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts_ns div 1000000").as("ts_ms"))
  }

  /** §2.7 — string/date rendering: padded summary line + dd/MM/yyyy
    * re-key (bot/BotUtils.java:196-209,307-319; Covid19Stats.java:70).
    * Rendering uses pad/concat (not %f formatting, whose rounding mode
    * differs across runtimes). */
  val renderSummary: Q = Q(
    "q19_render_summary",
    """SELECT o_orderkey,
      |       strftime(o_orderdate, '%d/%m/%Y') AS order_date,
      |       concat(rpad(o_orderpriority, 15, ' '), '|',
      |              lpad(CAST(o_orderkey AS VARCHAR), 12, ' '), '|',
      |              CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS line,
      |       upper(o_orderstatus) AS status,
      |       CASE WHEN o_totalprice >= 200000 THEN 'high'
      |            WHEN o_totalprice >= 100000 THEN 'mid'
      |            ELSE 'low' END AS bucket
      |FROM orders""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "dd/MM/yyyy").as("order_date"),
      concat(
        rpad(col("o_orderpriority"), 15, " "), lit("|"),
        lpad(col("o_orderkey").cast("string"), 12, " "), lit("|"),
        col("o_totalprice").cast(dec).cast("string")).as("line"),
      upper(col("o_orderstatus")).as("status"),
      when(col("o_totalprice") >= 200000, "high")
        .when(col("o_totalprice") >= 100000, "mid")
        .otherwise("low").as("bucket"))
  }

  /** §3.2 — the /stats serving query: lifetime totals + last-day slice +
    * doubling rate + rank, one declarative plan instead of the
    * reference's store point-gets (UserRequestConsumer.java:87-142,
    * StateStoresManager.java:121-186). */
  val summaryServe: Q = Q(
    "q20_summary_serve",
    """WITH totals AS (
      |  SELECT user_id, count(*) AS n_events,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
      |  FROM events GROUP BY 1),
      |today AS (
      |  SELECT user_id, count(*) AS today_n,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS today_value
      |  FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-30' GROUP BY 1),
      |j AS (
      |  SELECT totals.user_id, totals.n_events, totals.total_value,
      |         coalesce(today.today_n, 0) AS today_n,
      |         CAST(coalesce(today.today_value, 0) AS DECIMAL(18,2)) AS today_value
      |  FROM totals LEFT JOIN today USING (user_id))
      |SELECT user_id, n_events,
      |       CAST(total_value AS DOUBLE) AS total_value,
      |       today_n,
      |       CAST(today_value AS DOUBLE) AS today_value,
      |       CASE WHEN today_value = 0 OR total_value = 0 THEN 0
      |            ELSE CAST(round(70.0 * CAST(total_value AS DOUBLE)
      |                 / (100.0 * CAST(today_value AS DOUBLE))) AS BIGINT)
      |       END AS doubling_rate,
      |       row_number() OVER (ORDER BY j.total_value DESC, user_id) AS rnk
      |FROM j""".stripMargin
  ) { (s, dir) =>
    val ev = t(s, dir, "events")
    val totals = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("value").cast(dec)).cast(dec).as("total_value"))
    val today = ev.filter(to_date(col("ts")) === lit("2024-01-30").cast("date"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("today_n"), sum(col("value").cast(dec)).cast(dec).as("today_value"))
    val j = totals.join(today, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("total_value"),
        coalesce(col("today_n"), lit(0L)).as("today_n"),
        coalesce(col("today_value"), lit(0).cast(dec)).cast(dec).as("today_value"))
    val withRate = j.withColumn("doubling_rate",
      when(col("today_value") === 0 || col("total_value") === 0, lit(0L))
        .otherwise(round(lit(70.0) * col("total_value").cast("double")
          / (lit(100.0) * col("today_value").cast("double"))).cast(LongType)))
    // serving rank: two-phase partitioned rank, no global window.
    // Rank is computed over the exact decimal, then the output
    // representation goes double (driver hash rejects decimal outputs).
    graft.operators.Ranks.globalRowNumber(withRate,
      Seq(col("total_value").desc, col("user_id")), "rnk")
      .select(col("user_id"), col("n_events"),
        col("total_value").cast("double").as("total_value"),
        col("today_n"),
        col("today_value").cast("double").as("today_value"),
        col("doubling_rate"), col("rnk"))
  }

  /** §2.6 set ops — intersect/except/union (the reference only has
    * Stream.concat ≈ union; we provide the full family). */
  val setOps: Q = Q(
    "q21_set_ops",
    """WITH b AS (SELECT c_custkey AS ck FROM customer WHERE c_mktsegment = 'BUILDING'),
      |u AS (SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT 'both' AS tag, ck FROM (SELECT ck FROM b INTERSECT SELECT ck FROM u) t1
      |UNION ALL
      |SELECT 'building_only' AS tag, ck FROM (SELECT ck FROM b EXCEPT SELECT ck FROM u) t2""".stripMargin
  ) { (s, dir) =>
    val b = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("ck"))
    val u = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("ck")).distinct()
    b.intersect(u).select(lit("both").as("tag"), col("ck"))
      .unionAll(b.except(u).select(lit("building_only").as("tag"), col("ck")))
  }

  /** §2.5 — ranking/analytic family beyond the reference's sorts:
    * dense_rank, ntile, lead (SURVEY.md §2.5 "absent: built-in if
    * needed" — provided here). */
  val rankingSuite: Q = Q(
    "q22_ranking_suite",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |       dense_rank() OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC) AS drnk,
      |       ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS quartile,
      |       lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_orderkey
      |FROM orders""".stripMargin
  ) { (s, dir) =>
    val byPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").cast(dec).desc)
    val byKey = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      dense_rank().over(byPrice).as("drnk"),
      ntile(4).over(byKey).as("quartile"),
      lead(col("o_orderkey"), 1).over(byKey).as("next_orderkey"))
  }

  /** §2.7 array ops — collect_set / sort / join (UserPrefs.myStates
    * handling, bot/Covid19Bot.java:713,1092-1101). Arrays are sorted
    * before rendering so output is deterministic. */
  val arrayOps: Q = Q(
    "q23_array_ops",
    """SELECT o_custkey AS custkey,
      |       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS prios,
      |       count(*) AS n_orders
      |FROM orders GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("prios"),
        count(lit(1)).as("n_orders"))
  }

  /** ST5 — sessionization (absent in the reference; SURVEY.md §2.8 lists
    * it as the available extension): 30-minute-gap sessions per user.
    * Expressed as gap→flag→cumulative-sum so the DuckDB oracle can state
    * identical semantics; `session_window()` is the streaming form. */
  val sessionize: Q = Q(
    "q35_sessionize",
    """WITH g AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
      |         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
      |                OVER (PARTITION BY user_id ORDER BY event_id) > 1800000
      |              OR lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_id, ts_ms,
      |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id
      |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       min(ts_ms) AS session_start_ms,
      |       max(ts_ms) - min(ts_ms) AS duration_ms
      |FROM s GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000000").as("ts_ms"))
      .withColumn("new_session",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(w) > 1800000L ||
          lag(col("ts_ms"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("session_start_ms"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"))
  }

  /** HLL approximate distinct (SURVEY.md §2.4 "absent: distinct-count,
    * HLL … available if we extend"). Sketch values differ per
    * implementation ⇒ rows-only; the <5% error bound is unit-tested. */
  val approxDistinct: Q = Q.rowsOnly("q36_approx_distinct") { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
  }

  /** q36's EXACT twin (the q61/q63 treatment for the HLL entry): the
    * same grouping with a plain two-phase `countDistinct`, hash-checked
    * against DuckDB — so the probabilistic q36 stays rows-only while
    * the grouping, filter, and exact cardinalities it reports are
    * pinned bit-exact here, and `OpsSpec` asserts q36's HLL estimate
    * against THIS query's exact counts in one place. */
  val distinctExact: Q = Q(
    "q93_distinct_exact",
    """SELECT event_type,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       count(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin
  ) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
  }

  /** §2.5 — exact interpolated percentiles (absent in the reference;
    * both engines use linear interpolation over the sorted values). */
  val percentiles: Q = Q(
    "q37_percentiles",
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.5) AS p50_qty,
      |       quantile_cont(l_quantity, 0.9) AS p90_qty,
      |       quantile_cont(l_extendedprice, 0.9) AS p90_price
      |FROM lineitem GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("p50_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
        percentile(col("l_extendedprice"), lit(0.9)).as("p90_price"))
  }

  /** Token counting, BPE-ish: subword-class segmentation (letter runs /
    * digit runs / punctuation runs — the GPT-2 pre-tokenizer shape)
    * alongside whitespace tokens; \p classes behave identically in Java
    * regex (Spark) and RE2 (DuckDB) for these inputs. */
  val tokenCount: Q = Q(
    "q38_token_count",
    """SELECT doc_id,
      |       len(string_split(text, ' ')) AS ws_tokens,
      |       len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+')) AS bpe_tokens,
      |       CAST(strlen(text) AS DOUBLE)
      |         / len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+')) AS bytes_per_token
      |FROM documents""".stripMargin
  ) { (s, dir) =>
    val pat = """\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+"""
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("bpe_tokens"),
      (octet_length(col("text")).cast("double")
        / size(regexp_extract_all(col("text"), lit(pat), lit(0)))).as("bytes_per_token"))
  }

  /** Percentiles at scale: `approx_percentile` (KLL/GK-style sketch,
    * bounded memory per group, mergeable map-side) — the 100 TB path
    * for q37's semantics, whose exact `percentile` buffers every value
    * per group. Sketch values are engine-specific ⇒ rows-only; the
    * error bound vs the exact values is asserted in spec. */
  val approxPercentiles: Q = Q.rowsOnly("q46_approx_percentiles") { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_percentile(col("l_quantity"), lit(0.5), lit(1000)).as("p50_qty"),
        approx_percentile(col("l_quantity"), lit(0.9), lit(1000)).as("p90_qty"),
        approx_percentile(col("l_extendedprice"), lit(0.9), lit(1000)).as("p90_price"))
  }

  /** P11/§2.7 — the bot's distributed alert-line rendering as a
    * driver-checked query (AlertTextTests:23-64 semantics: skip-zero
    * segments comma-joined, singular/plural words, Total suppressed,
    * all-zero rows render empty). The per-key "deltas" are
    * deterministic event counts; `concat_ws` skips NULL segments
    * identically in both engines. */
  val alertLines: Q = Q(
    "q52_alert_lines",
    """WITH d AS (
      |  SELECT user_id,
      |         count(*) FILTER (WHERE event_type = 'click')    AS dc,
      |         count(*) FILTER (WHERE event_type = 'error')    AS dd,
      |         count(*) FILTER (WHERE event_type = 'purchase') AS dr
      |  FROM events GROUP BY 1)
      |SELECT user_id, dc, dd, dr,
      |       CASE WHEN concat_ws(', ',
      |              CASE WHEN dc > 0 THEN dc || ' new ' || (CASE WHEN dc = 1 THEN 'case' ELSE 'cases' END) END,
      |              CASE WHEN dd > 0 THEN dd || ' '     || (CASE WHEN dd = 1 THEN 'death' ELSE 'deaths' END) END,
      |              CASE WHEN dr > 0 THEN dr || ' '     || (CASE WHEN dr = 1 THEN 'recovery' ELSE 'recoveries' END) END) = ''
      |            THEN ''
      |            ELSE concat_ws(', ',
      |              CASE WHEN dc > 0 THEN dc || ' new ' || (CASE WHEN dc = 1 THEN 'case' ELSE 'cases' END) END,
      |              CASE WHEN dd > 0 THEN dd || ' '     || (CASE WHEN dd = 1 THEN 'death' ELSE 'deaths' END) END,
      |              CASE WHEN dr > 0 THEN dr || ' '     || (CASE WHEN dr = 1 THEN 'recovery' ELSE 'recoveries' END) END)
      |              || ' in u' || user_id || chr(10)
      |       END AS alert_line
      |FROM d""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("dc"),
        count(when(col("event_type") === "error", 1)).as("dd"),
        count(when(col("event_type") === "purchase", 1)).as("dr"))
      .withColumn("alert_line",
        graft.render.AlertFormat.deltaAlertLineCol(
          col("dc"), col("dd"), col("dr"),
          concat(lit("u"), col("user_id").cast("string"))))
  }

  val all: Seq[Q] = Seq(movingAvg, pivotSeries, rollupTotal, zipJoin,
    prefsArrayJoin, dedupTtl, renderSummary, summaryServe, setOps,
    rankingSuite, arrayOps, sessionize, approxDistinct, distinctExact,
    percentiles,
    approxPercentiles, tokenCount, alertLines)
}
