package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.sources.Tables

/** Batch form of the reference's relational operator surface
  * (SURVEY.md §2.2-§2.7). Each query maps an operator family from the
  * reference (file:line cited per query) onto the driver's TPC-H-ish
  * test tables, with a DuckDB oracle.
  *
  * Numeric-determinism policy (oracle hash-match): sums/averages over
  * doubles are order-dependent, so every aggregated money/value column
  * is cast to DECIMAL(18,2) first (exact, order-independent); per-row
  * double arithmetic is IEEE-deterministic and left as double.
  *
  * Output-representation policy (driver hash): no DECIMAL column may
  * appear in a FINAL output schema — the driver's hash renders Spark
  * parquet decimals and DuckDB decimals differently (r1+r2 evidence:
  * every decimal-typed output failed hash_match, every non-decimal
  * passed). Each final decimal column is therefore cast to DOUBLE on
  * BOTH sides: both engines derive the identical nearest-double from
  * the same exact decimal, so the cast is deterministic.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val dec = DecimalType(18, 2)

  /** P1-P3/P9/P10/P12 — filters, membership predicate, derived per-row
    * metric (covid19-patients-analyzer/.../Covid19PatientAnalyzer.java:58,84,
    * covid19-telegram-bot/.../BotUtils.java:44-54,175-177,206). */
  val filterProject: Q = Q(
    "q01_filter_project",
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      |       l_extendedprice * (1.0 - l_discount) AS net_price,
      |       CAST(l_shipdate AS DATE) AS ship_day
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
      |  AND l_returnflag IN ('R', 'A') AND l_quantity >= 1""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate").between(
        to_timestamp(lit("1995-01-01 00:00:00")),
        to_timestamp(lit("1996-12-31 00:00:00"))))
      .filter(col("l_returnflag").isin("R", "A") && col("l_quantity") >= 1)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        to_date(col("l_shipdate")).as("ship_day"))
  }

  /** A1/A2/W4 batch form — running delta per key = value − previous value,
    * first delta measured against a zero-initialized aggregate
    * (covid19-stats/.../Covid19Stats.java:227-242: adder computes
    * newTotal − aggregate.currentTotal with init all-zero). */
  val runningDelta: Q = Q(
    "q02_running_delta",
    """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
      |       value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 0.0) AS delta
      |FROM events""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("event_id")
    t(s, dir, "events").select(
      col("user_id"), col("event_id"),
      expr("ts_ns div 1000000").as("ts_ms"), col("value"),
      (col("value") - coalesce(lag(col("value"), 1).over(w), lit(0.0))).as("delta"))
  }

  /** A3/A5 — 1-day tumbling window aggregate keyed by type, window start
    * re-keyed as a date column (Covid19Stats.java:137-147,150-161). */
  val dailyAgg: Q = Q(
    "q03_daily_agg",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |       max(value) AS max_value
      |FROM events GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // Decimal accumulation (order-independent), DOUBLE output (the
        // driver hash rejects any decimal-typed output column).
        sum(col("value").cast(dec)).cast("double").as("sum_value"),
        max(col("value")).as("max_value"))
      .select(to_date(col("w.start")).as("day"), col("event_type"),
        col("n_events"), col("sum_value"), col("max_value"))
  }

  /** A4 — 1-day tumbling window over a composite key, carrying the latest
    * value in the window (Covid19Stats.java:114-123,244-256: sum of deltas
    * + overwrite of currents with the newest snapshot). */
  val dailyAggUser: Q = Q(
    "q04_daily_agg_user",
    """SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |       max_by(value, event_id) AS last_value
      |FROM events GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("user_id"), window(col("ts"), "1 day").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).cast("double").as("sum_value"),
        max_by(col("value"), col("event_id")).as("last_value"))
      .select(col("user_id"), to_date(col("w.start")).as("day"),
        col("n_events"), col("sum_value"), col("last_value"))
  }

  /** P4 — doubling-rate projection over the daily aggregate:
    * 70 / (100·Δ/current) with zero guards
    * (Covid19Stats.java:164-167,196-203). */
  val doublingRate: Q = Q(
    "q05_doubling_rate",
    """WITH d AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
      |  FROM events GROUP BY 1, 2),
      |dd AS (
      |  SELECT day, event_type, total,
      |         CAST(total - coalesce(lag(total) OVER (PARTITION BY event_type ORDER BY day), 0) AS DECIMAL(18,2)) AS delta
      |  FROM d)
      |SELECT day, event_type,
      |       CAST(total AS DOUBLE) AS total, CAST(delta AS DOUBLE) AS delta,
      |       CASE WHEN delta = 0 OR total = 0 THEN 0
      |            ELSE CAST(round(70.0 * CAST(total AS DOUBLE) / (100.0 * CAST(delta AS DOUBLE))) AS BIGINT)
      |       END AS doubling_rate
      |FROM dd""".stripMargin
  ) { (s, dir) =>
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(col("value").cast(dec)).cast(dec).as("total"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("delta",
        (col("total") - coalesce(lag(col("total"), 1).over(w), lit(0).cast(dec))).cast(dec))
      .withColumn("doubling_rate",
        when(col("delta") === 0 || col("total") === 0, lit(0L))
          .otherwise(round(lit(70.0) * col("total").cast("double")
            / (lit(100.0) * col("delta").cast("double"))).cast(LongType)))
      // Decimal math above; DOUBLE representation out (driver hash).
      .select(col("day"), col("event_type"),
        col("total").cast("double").as("total"),
        col("delta").cast("double").as("delta"),
        col("doubling_rate"))
  }

  /** W1/W2 — top-N per group via ranking window
    * (bot/BotUtils.java:357-377; bot/Covid19Bot.java:958-959 — the
    * reference sorts client-side; we rank distributed). */
  val topnOrders: Q = Q(
    "q06_topn_orders",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  /** J1 — multi-way enrichment join, dimensions broadcast
    * (StatsAlertConsumerConfig.java:114-124,159-178). nation/region are
    * genuinely small at any scale → explicit broadcast; customer/orders
    * are left to Catalyst+AQE (they grow with sf). */
  val joinEnrich: Q = Q(
    "q07_join_enrich",
    """SELECT n_name AS nation, r_name AS region,
      |       count(*) AS n_lineitems,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |JOIN orders   ON l_orderkey  = o_orderkey
      |JOIN customer ON o_custkey   = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    // partial-aggregation pushdown below the join (an eager-agg rewrite
    // Catalyst does not apply): collapse lineitem to one row per
    // orderkey before joining — every downstream shuffle then carries
    // |orders| rows instead of |lineitem| (~4×), and the orderkey
    // partitioning from this aggregation is reused by the join exchange.
    // Decimal partial sums re-sum exactly, so the oracle is unaffected.
    val perOrder = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("li_cnt"),
        sum(col("l_extendedprice").cast(dec)).as("li_sum"))
    perOrder
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name").as("nation"), col("r_name").as("region"))
      .agg(sum(col("li_cnt")).as("n_lineitems"),
        sum(col("li_sum")).cast("double").as("sum_price"))
  }

  /** J3 — composite-key lookup join: per-(user,type) daily activity
    * enriched with the (user,type) lifetime totals
    * (district/DistrictAlertConsumer.java:96-101). */
  val joinComposite: Q = Q(
    "q08_join_composite",
    """WITH daily AS (
      |  SELECT user_id, event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         count(*) AS n FROM events GROUP BY 1, 2, 3),
      |totals AS (
      |  SELECT user_id, event_type, count(*) AS total_n FROM events GROUP BY 1, 2)
      |SELECT daily.user_id, daily.event_type, daily.day, daily.n, totals.total_n
      |FROM daily JOIN totals USING (user_id, event_type)""".stripMargin
  ) { (s, dir) =>
    val ev = t(s, dir, "events")
    val daily = ev.groupBy(col("user_id"), col("event_type"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val totals = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("total_n"))
    daily.join(totals, Seq("user_id", "event_type"))
      .select("user_id", "event_type", "day", "n", "total_n")
  }

  /** J6 — as-of (latest ≤ cutoff within lookback) per key
    * (StateStoresManager.java:212-229: probe day-by-day backwards; here a
    * single ranked scan — one shuffle, no point-get loop). */
  val asofLatest: Q = Q(
    "q09_asof_latest",
    """SELECT user_id, event_id AS last_event_id, epoch_ms(ts) AS ts_ms,
      |       value AS last_value
      |FROM (
      |  SELECT user_id, event_id, ts, value,
      |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events
      |  WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
      |    AND ts >= TIMESTAMP '2024-01-06 00:00:00') t
      |WHERE rn = 1""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    t(s, dir, "events")
      .filter(col("ts") <= to_timestamp(lit("2024-01-20 00:00:00")) &&
        col("ts") >= to_timestamp(lit("2024-01-06 00:00:00")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        expr("ts_ns div 1000000").as("ts_ms"), col("value").as("last_value"))
  }

  /** J5 — date-dimension join: generated day sequence left-joined to the
    * daily fact roll-up (Visualizer.java:102-107,197-215 does O(days)
    * point lookups; here one generated dimension + one join). */
  val datedimJoin: Q = Q(
    "q10_datedim_join",
    """WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS d0,
      |                  CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
      |dates AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      |daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
      |                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price
      |          FROM orders GROUP BY 1)
      |SELECT dates.day, coalesce(daily.n_orders, 0) AS n_orders,
      |       CAST(coalesce(daily.sum_price, 0) AS DOUBLE) AS sum_price
      |FROM dates LEFT JOIN daily USING (day)""".stripMargin
  ) { (s, dir) =>
    val o = t(s, dir, "orders").withColumn("day", to_date(col("o_orderdate")))
    val bounds = o.agg(min("day").as("d0"), max("day").as("d1"))
    val dates = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val daily = o.groupBy("day")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec)).cast(dec).as("sum_price"))
    dates.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("sum_price"), lit(0).cast(dec)).cast("double").as("sum_price"))
  }

  /** Exact dedup — hash-groupBy canonicalization (north-star operator;
    * same shape as the reference's latest-per-key KTable, S1). */
  val dedupExact: Q = Q(
    "q11_dedup_exact",
    """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
      |       count(*) AS n_dupes
      |FROM documents GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dupes"))
  }

  /** §2.7 JSON decode — from_json/get_json_object at the ingest edge
    * (StatewiseDeltaSerde.java:14-27). */
  val jsonExtract: Q = Q(
    "q12_json_extract",
    """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k FROM events""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
  }

  /** The SERVING ROW — the reference bot's per-state response (current
    * total, delta vs the previous day, doubling rate:
    * UserRequestConsumer.java:87-142 assembles these from the state
    * stores per request). One row per key, latest day only. The Spark
    * side is [[graft.serve.LiveServing.servingRows]] — the EXACT code
    * [[graft.serve.LiveEndpoint]] serves over a live stream's view —
    * over the q05 daily-total frame, so this oracle pins the live HTTP
    * body's semantics in batch. latest-per-key rides the KTable
    * operator ([[graft.state.MaterializedViews.latestPerKey]]). */
  val stateServing: Q = Q(
    "q251_state_serving",
    """WITH d AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
      |  FROM events GROUP BY 1, 2),
      |dd AS (
      |  SELECT day, event_type, total,
      |         CAST(total - coalesce(lag(total) OVER (PARTITION BY event_type ORDER BY day), 0) AS DECIMAL(18,2)) AS delta
      |  FROM d),
      |latest AS (SELECT event_type, max(day) AS day FROM d GROUP BY 1)
      |SELECT dd.event_type, dd.day,
      |       CAST(dd.total AS DOUBLE) AS total,
      |       CAST(dd.delta AS DOUBLE) AS delta,
      |       CASE WHEN dd.delta = 0 OR dd.total = 0 THEN 0
      |            ELSE CAST(round(70.0 * CAST(dd.total AS DOUBLE) / (100.0 * CAST(dd.delta AS DOUBLE))) AS BIGINT)
      |       END AS doubling_rate
      |FROM dd JOIN latest ON dd.event_type = latest.event_type AND dd.day = latest.day""".stripMargin
  ) { (s, dir) =>
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(col("value").cast(dec)).cast(dec).as("total"))
    graft.serve.LiveServing.servingRows(daily, "event_type")
      // decimal math inside; DOUBLE representation out (driver hash)
      .select(col("event_type"), col("day"),
        col("total").cast("double").as("total"),
        col("delta").cast("double").as("delta"),
        col("doubling_rate"))
  }

  val all: Seq[Q] = Seq(filterProject, runningDelta, dailyAgg, dailyAggUser,
    doublingRate, topnOrders, joinEnrich, joinComposite, asofLatest,
    datedimJoin, dedupExact, jsonExtract, stateServing)
}
