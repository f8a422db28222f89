package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.render.ChartJson
import graft.sources.Tables

/** The visualizer egress surface (SURVEY.md §7.2 step 8): chart series
  * extraction and full ChartRequest JSON assembly, mirroring the
  * reference's scheduled charts (covid19-visualizer/.../Visualizer.java).
  */
object ChartQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Day × top-5 trend series (Visualizer.java:188-215 top5StatesTrend):
    * the reference hardcodes its five "interesting states"
    * (Visualizer.java:193) and point-gets each (state, day) from the
    * store; here the top-5 keys are computed (count-ranked, distributed)
    * and the daily series comes from one aggregation — no O(days×states)
    * store loop. Long form (user, day, label, n) so the oracle is plain
    * SQL; the chart assembly over it is q42 + ChartJsonSpec.
    */
  val chartSeries: Q = Q(
    "q41_chart_series",
    """WITH top5 AS (
      |  SELECT user_id FROM events GROUP BY user_id
      |  ORDER BY count(*) DESC, user_id LIMIT 5)
      |SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |       strftime(CAST(date_trunc('day', ts) AS DATE), '%b %d') AS monthday,
      |       count(*) AS n
      |FROM events WHERE user_id IN (SELECT user_id FROM top5)
      |GROUP BY 1, 2, 3""".stripMargin
  ) { (s, dir) =>
    val ev = t(s, dir, "events")
    // top-5 keys: tiny result, broadcast back against the fact scan
    val top5 = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("user_id")).limit(5)
      .select("user_id")
    ev.join(broadcast(top5), Seq("user_id"))
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("day"),
        date_format(col("day"), "MMM dd").as("monthday"), col("n"))
  }

  /** Full ChartRequest JSON for the doubling-rate-chart shape
    * (Visualizer.java:155-186 doublingRateChart: LINE, single "Doubling
    * Rate" dataset, RED, displayLabels=true; serialization
    * VisualizationService.java:31-36). Daily totals roll up
    * distributed; only the chart-sized label/data arrays are collected
    * into the one-row request. The oracle rebuilds the identical Gson
    * bytes by string concatenation in DuckDB.
    */
  val chartJson: Q = Q(
    "q42_chart_json",
    """WITH d AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT string_agg('"' || strftime(day, '%b %d') || '"', ',' ORDER BY day) AS labels,
      |         string_agg(n || '.0', ',' ORDER BY day) AS data
      |  FROM d)
      |SELECT '{"backgroundColor":"transparent","width":"750","height":"450","format":"png","chart":{"type":"line","data":{"labels":['
      |  || labels || '],"datasets":[{"type":"line","label":"Doubling Rate","data":['
      |  || data
      |  || '],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}]},"options":{"plugins":{"datalabels":{"display":true,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":false,"ticks":{"beginAtZero":true}}],"yAxes":[{"id":"left-y-axis","position":"left","stacked":false,"ticks":{"beginAtZero":true}}]},"title":{"display":false,"text":""}}}}' AS chart_json
      |FROM s""".stripMargin
  ) { (s, dir) =>
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    // one-row collect of chart-sized arrays, day-ordered via array_sort
    // on (day, label, value) structs
    val rows = daily
      .agg(array_sort(collect_list(struct(
        col("day"), date_format(col("day"), "MMM dd").as("label"),
        col("n").cast("double").as("v")))).as("rows"))
      .select(
        expr("transform(rows, r -> r.label)").as("labels"),
        expr("transform(rows, r -> r.v)").as("data"))
    val ds = ChartJson.dataset(
      lit(ChartJson.Line), lit("Doubling Rate"), col("data"), lit(ChartJson.Red))
    rows.select(
      ChartJson.requestJson(
        ChartJson.chart(ChartJson.Line, col("labels"), array(ds),
          displayLabels = true)).as("chart_json"))
  }

  /** Per-key chart FANOUT (Visualizer.java:371-424 statewiseTotal): one
    * stacked-bar ChartRequest JSON row per key from a single grouped
    * plan — the reference loops keys on the driver with store point-gets
    * and a sleep per chart. Keys here are event types standing in for
    * states; the three series are deterministic integer counts so the
    * oracle can rebuild the identical Gson bytes per key by string
    * concatenation (the q42 technique, per group). */
  val chartFanout: Q = {
    val dsTail = ""","fill":false,"borderColor":"COLOR","backgroundColor":"COLOR","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}"""
    def ds(label: String, dataExpr: String, color: String): String =
      s"""'{"type":"bar","label":"$label","data":[' || $dataExpr || ']' ||
         |'${dsTail.replace("COLOR", color)}'""".stripMargin.replace("\n", " ")
    Q(
      "q51_chart_fanout",
      s"""WITH d AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         count(*) AS a,
         |         count(*) FILTER (WHERE value >= 0.5) AS r,
         |         count(*) FILTER (WHERE value < 0.1) AS dd
         |  FROM events GROUP BY 1, 2),
         |s AS (
         |  SELECT event_type,
         |         string_agg('"' || strftime(day, '%b %d') || '"', ',' ORDER BY day) AS labels,
         |         string_agg(a || '.0', ',' ORDER BY day) AS act,
         |         string_agg(dd || '.0', ',' ORDER BY day) AS dth,
         |         string_agg(r || '.0', ',' ORDER BY day) AS rec
         |  FROM d GROUP BY 1)
         |SELECT event_type || '-statewisetotal' AS key,
         |  '{"backgroundColor":"transparent","width":"750","height":"450","format":"png","chart":{"type":"bar","data":{"labels":['
         |  || labels || '],"datasets":['
         |  || ${ds("Active", "act", "rgb(201, 203, 207)")}
         |  || ',' || ${ds("Deaths", "dth", "rgb(255, 99, 132)")}
         |  || ',' || ${ds("Recovered", "rec", "rgb(54, 162, 235)")}
         |  || ']},"options":{"plugins":{"datalabels":{"display":false,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":true,"ticks":{"beginAtZero":true}}],"yAxes":[{"id":"left-y-axis","position":"left","stacked":true,"ticks":{"beginAtZero":true}}]},"title":{"display":false,"text":""}}}}'
         |  AS value
         |FROM s""".stripMargin
    ) { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(col("event_type").as("state"), to_date(col("ts")).as("day"))
        .agg(
          count(lit(1)).as("active"),
          count(when(col("value") >= 0.5, 1)).as("recovered"),
          count(when(col("value") < 0.1, 1)).as("deceased"))
        .withColumn("label", date_format(col("day"), "MMM dd"))
      graft.serve.ChartPipeline.statewiseTotalCharts(daily)
    }
  }

  /** Since-origin cumulative history trend (Visualizer.java:241-287
    * historyTrend): four LINE series of running totals per day — the
    * reference walks every date since 30/01/2020 with a store point-get
    * per day; here the daily roll-up is one distributed aggregation and
    * the running totals are computed inside the one-row chart-sized
    * array (an O(days²) HOF on ≤ a few thousand elements — NOT a
    * partition-less window funneling the frame through one task, the
    * repo-wide plan invariant). Series derivations mirror q51's
    * deterministic integer counts so the oracle rebuilds the identical
    * Gson bytes by string concatenation (DuckDB uses window sums — fine
    * there, the oracle is single-node by definition). */
  val historyChart: Q = {
    val dsTail = ""","fill":false,"borderColor":"COLOR","backgroundColor":"COLOR","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}"""
    def ds(label: String, dataExpr: String, color: String): String =
      s"""'{"type":"line","label":"$label","data":[' || $dataExpr || ']' ||
         |'${dsTail.replace("COLOR", color)}'""".stripMargin.replace("\n", " ")
    Q(
      "q53_history_chart",
      s"""WITH d AS (
         |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |         count(*) AS a,
         |         count(*) FILTER (WHERE value >= 0.5) AS r,
         |         count(*) FILTER (WHERE value < 0.1) AS dd
         |  FROM events GROUP BY 1),
         |c AS (
         |  SELECT day, strftime(day, '%b %d') AS label,
         |         sum(a) OVER (ORDER BY day) AS ca,
         |         sum(r) OVER (ORDER BY day) AS cr,
         |         sum(dd) OVER (ORDER BY day) AS cd
         |  FROM d),
         |s AS (
         |  SELECT string_agg('"' || label || '"', ',' ORDER BY day) AS labels,
         |         string_agg(ca || '.0', ',' ORDER BY day) AS total,
         |         string_agg((ca - cr - cd) || '.0', ',' ORDER BY day) AS act,
         |         string_agg(cr || '.0', ',' ORDER BY day) AS rec,
         |         string_agg(cd || '.0', ',' ORDER BY day) AS dec
         |  FROM c)
         |SELECT 'historytrend' AS key,
         |  '{"backgroundColor":"transparent","width":"750","height":"450","format":"png","chart":{"type":"line","data":{"labels":['
         |  || labels || '],"datasets":['
         |  || ${ds("Total Cases", "total", "rgb(54, 162, 235)")}
         |  || ',' || ${ds("Active", "act", "rgb(255, 205, 86)")}
         |  || ',' || ${ds("Recovered", "rec", "rgb(75, 192, 192)")}
         |  || ',' || ${ds("Deceased", "dec", "rgb(255, 99, 132)")}
         |  || ']},"options":{"plugins":{"datalabels":{"display":false,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":false,"ticks":{"beginAtZero":true}}],"yAxes":[{"id":"left-y-axis","position":"left","stacked":false,"ticks":{"beginAtZero":true}}]},"title":{"display":false,"text":""}}}}'
         |  AS value
         |FROM s""".stripMargin
    ) { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          count(lit(1)).as("a"),
          count(when(col("value") >= 0.5, 1)).as("r"),
          count(when(col("value") < 0.1, 1)).as("d"))
        .withColumn("label", date_format(col("day"), "MMM dd"))
      // empty-range guard: sequence(1, 0) would yield [1, 0] (step
      // defaults to -1 when start > stop) — two phantom points where
      // the oracle's string_agg over zero rows yields NULL.
      // Oracle-domain bound: data values render via Double.toString,
      // which matches the reference's Gson exactly (both switch to
      // scientific notation at 1e7) but diverges from the oracle's
      // digit concatenation there — valid while cumulative totals stay
      // below 1e7 (driver SFs peak at 1e5; at sf10+ the oracle, not
      // the engine, would need the scientific rendering).
      def cum(e: String) =
        "IF(size(rows) = 0, CAST(array() AS ARRAY<DOUBLE>), " +
          "transform(sequence(1, size(rows)), i -> " +
          s"CAST(aggregate(slice(rows, 1, i), 0L, (acc, x) -> acc + ($e)) AS DOUBLE)))"
      val arrays = daily
        .agg(array_sort(collect_list(struct(
          col("day"), col("label"), col("a"), col("r"), col("d")))).as("rows"))
        .select(
          expr("transform(rows, x -> x.label)").as("labels"),
          expr(cum("x.a")).as("total"),
          expr(cum("x.a - x.r - x.d")).as("act"),
          expr(cum("x.r")).as("rec"),
          expr(cum("x.d")).as("dec"))
      graft.serve.ChartPipeline.historyTrendFromArrays(arrays, "historytrend")
    }
  }

  /** Long-form testing-trend series (Visualizer.java:289-368 math,
    * minus the Gson rendering — that part is byte-golden in
    * ChartJsonSpec): per-day tested/positive with the CONDITIONAL
    * 5-day moving positivity window — only days where both values
    * exist ingest a rate, every day reports the mean of the last ≤5
    * ingested, 0 before any data. Null days are synthesized
    * deterministically (day-of-month rules) so the skip/carry
    * semantics are exercised under the oracle. The mean is quantized
    * to 1e-4 (`round(ma*1e4)` both sides): DuckDB's windowed avg may
    * combine the frame in segment-tree order vs the engine's
    * sequential fold — ulp-level divergence the quantization absorbs
    * (the q50 ln() treatment). */
  val testingSeries: Q = Q(
    "q55_testing_series",
    """WITH d0 AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |         count(*) AS t_raw,
      |         count(*) FILTER (WHERE value >= 0.8) AS p_raw
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT day,
      |         CASE WHEN date_part('day', day) % 7 = 0 THEN NULL ELSE t_raw END AS tested,
      |         CASE WHEN date_part('day', day) % 5 = 0 THEN NULL ELSE p_raw END AS positive
      |  FROM d0),
      |v AS (
      |  SELECT day, CAST(positive AS DOUBLE) / tested * 100.0 AS rate
      |  FROM d WHERE tested IS NOT NULL AND positive IS NOT NULL),
      |m AS (
      |  SELECT day,
      |         avg(rate) OVER (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma
      |  FROM v)
      |SELECT d.day, d.tested, d.positive,
      |       COALESCE(CAST(round(
      |         (SELECT m.ma FROM m WHERE m.day <= d.day
      |          ORDER BY m.day DESC LIMIT 1) * 10000.0) AS BIGINT), 0) AS ma_q4
      |FROM d""".stripMargin
  ) { (s, dir) =>
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("t_raw"),
        count(when(col("value") >= 0.8, 1)).as("p_raw"))
      .select(col("day"),
        when(dayofmonth(col("day")) % 7 === 0, lit(null)).otherwise(col("t_raw"))
          .as("tested"),
        when(dayofmonth(col("day")) % 5 === 0, lit(null)).otherwise(col("p_raw"))
          .as("positive"))
    val rows1 = daily
      .agg(array_sort(collect_list(struct(col("day"),
        col("tested").as("tl"), col("positive").as("pl"),
        col("tested").cast("double").as("t"),
        col("positive").cast("double").as("p")))).as("rows"))
      .select(col("rows"),
        expr(graft.serve.ChartPipeline.positivityMaExpr(round2 = false)).as("ma"))
    rows1
      .select(posexplode(col("rows")).as(Seq("pos", "r")), col("ma"))
      .select(col("r.day").as("day"), col("r.tl").as("tested"),
        col("r.pl").as("positive"),
        round(element_at(col("ma"), col("pos") + 1) * lit(10000.0))
          .cast("long").as("ma_q4"))
  }

  /** Gap-filled chart series (Visualizer.java:155-186 / 197-215: the
    * reference's chart loops probe EVERY day in their range, so silent
    * days still get a label and a zero) — the q85 date-spine machinery
    * promoted into the serving layer via `ChartPipeline.gapFillDaily`.
    * The rare-event filter (value ≥ 220, the distribution's far tail)
    * makes most (day, type) cells genuinely SILENT at verify scale, so
    * the oracle checks real zero-fill, not a dense no-op. Spine = days
    * × types observed among rare events; counts coalesce to 0. */
  val denseChartSeries: Q = Q(
    "q86_dense_chart_series",
    """WITH rare AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |         count(*) AS n
      |  FROM events WHERE value >= 220.0 GROUP BY 1, 2),
      |b AS (SELECT min(day) AS lo, max(day) AS hi FROM rare),
      |days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
      |                     AS DATE) AS day FROM b),
      |types AS (SELECT DISTINCT event_type FROM rare)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day,
      |       strftime(d.day, '%b %d') AS label, t.event_type,
      |       COALESCE(r.n, 0) AS n
      |FROM days d CROSS JOIN types t
      |LEFT JOIN rare r ON r.day = d.day AND r.event_type = t.event_type""".stripMargin
  ) { (s, dir) =>
    val rare = t(s, dir, "events")
      .filter(col("value") >= 220.0)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    graft.serve.ChartPipeline.gapFillDaily(rare, Seq("n"), dims = Seq("event_type"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("label"),
        col("event_type"), col("n"))
  }

  /** q289: the SHIP-SLA dashboard chart — q287's lead-time profile
    * (exact integer p50/p90 shipping days per order priority) as one
    * byte-exact ChartRequest: grouped bars, priorities on the x-axis,
    * P50 and P90 series (the operational "does URGENT actually ship
    * faster" readout as the reference's visualizer would POST it).
    * This is the r11 verdict's task 7: the inference wave gets a chart
    * face, wired as an [[graft.serve.HttpEndpoint]] route (`/sla`)
    * over THIS registered, hash-oracled query. The q42 technique: the
    * priority grain is ≤ 5 rows by construction, so only chart-sized
    * label/data arrays are collected into the one-row request; the
    * oracle rebuilds the identical Gson bytes by string concatenation
    * over q287's own CTE chain. */
  val slaChart: Q = Q(
    "q289_sla_chart",
    """WITH j AS (SELECT o.o_orderpriority AS pri,
      |             date_diff('day', CAST(o.o_orderdate AS DATE),
      |                       CAST(l.l_shipdate AS DATE)) AS d
      |           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |h AS (SELECT pri, d, CAST(count(*) AS BIGINT) AS c
      |      FROM j GROUP BY 1, 2),
      |cum AS (SELECT pri, d, c,
      |          CAST(sum(c) OVER (PARTITION BY pri ORDER BY d) AS BIGINT)
      |            AS cc
      |        FROM h),
      |n AS (SELECT pri, CAST(sum(c) AS BIGINT) AS n
      |      FROM h GROUP BY 1),
      |prof AS (SELECT n.pri,
      |           CAST(min(CASE WHEN 2 * cum.cc >= n.n THEN cum.d END)
      |             AS BIGINT) AS p50_days,
      |           CAST(min(CASE WHEN 10 * cum.cc >= 9 * n.n THEN cum.d END)
      |             AS BIGINT) AS p90_days
      |         FROM cum JOIN n USING (pri)
      |         GROUP BY 1),
      |s AS (SELECT string_agg('"' || pri || '"', ',' ORDER BY pri) AS labels,
      |             string_agg(p50_days || '.0', ',' ORDER BY pri) AS d50,
      |             string_agg(p90_days || '.0', ',' ORDER BY pri) AS d90
      |      FROM prof)
      |SELECT '{"backgroundColor":"transparent","width":"750","height":"450","format":"png","chart":{"type":"bar","data":{"labels":['
      |  || labels || '],"datasets":[{"type":"bar","label":"P50 Ship Days","data":['
      |  || d50
      |  || '],"fill":false,"borderColor":"rgb(54, 162, 235)","backgroundColor":"rgb(54, 162, 235)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},{"type":"bar","label":"P90 Ship Days","data":['
      |  || d90
      |  || '],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}]},"options":{"plugins":{"datalabels":{"display":true,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":false,"ticks":{"beginAtZero":true}}],"yAxes":[{"id":"left-y-axis","position":"left","stacked":false,"ticks":{"beginAtZero":true}}]},"title":{"display":false,"text":""}}}}' AS chart_json
      |FROM s""".stripMargin
  ) { (s, dir) =>
    // the registered q287 machinery verbatim, reduced to the chart's
    // two series; priorities are ≤ 5 by construction
    val prof = WarehouseQueries.shipLatency.fn(s, dir)
      .select(col("pri"), col("p50_days").cast("double").as("p50"),
        col("p90_days").cast("double").as("p90"))
    val rows = prof
      .agg(array_sort(collect_list(struct(
        col("pri"), col("p50"), col("p90")))).as("rows"))
      .select(
        expr("transform(rows, r -> r.pri)").as("labels"),
        expr("transform(rows, r -> r.p50)").as("d50"),
        expr("transform(rows, r -> r.p90)").as("d90"))
    val ds = array(
      ChartJson.dataset(lit(ChartJson.Bar), lit("P50 Ship Days"),
        col("d50"), lit(ChartJson.Blue)),
      ChartJson.dataset(lit(ChartJson.Bar), lit("P90 Ship Days"),
        col("d90"), lit(ChartJson.Red)))
    rows.select(
      ChartJson.requestJson(
        ChartJson.chart(ChartJson.Bar, col("labels"), ds,
          displayLabels = true)).as("chart_json"))
  }

  /** q303: the CLASSIFIER-EVALUATION chart face (r12 verdict task 5) —
    * q254's reliability diagram + q296's Brier/Murphy decomposition +
    * q297's AUC served as ONE byte-exact ChartRequest: grouped bars
    * (mean predicted ppm vs observed rate ppm per calibration bin —
    * the reliability diagram in the reference visualizer's bar idiom)
    * with the scalar triptych (Brier = REL − RES + UNC + WBV, AUC)
    * stamped into the chart TITLE, the reference's own pattern of
    * deriving title text from the data window just assembled
    * (covid19-visualizer/.../Visualizer.java:288-319's combo rate
    * chart). Wired as the `/calibration` [[graft.serve.HttpEndpoint]]
    * route over THIS registered, hash-oracled query.
    *
    * No fourth implementation to drift: the Spark side calls the three
    * REGISTERED query fns verbatim (bin/1-row grains — only chart-
    * sized arrays are collected into the one-row request), and the
    * oracle is assembled from the same shared CTE chains q254/q296/
    * q297's own oracles use ([[CurationQueries.predictorCte]] /
    * brierCtes / aucCtes — the ADVICE r12 no-drift rule). All title
    * and data numbers are exact BIGINTs rendered to strings, so the
    * byte equality is integer-exact end to end. */
  val calibrationChart: Q = Q(
    "q303_calibration_chart",
    CurationQueries.predictorCte + CurationQueries.brierCtes +
      CurationQueries.aucCtes + """,
      |s AS (SELECT string_agg('"' || bin || '"', ',' ORDER BY bin) AS labels,
      |             string_agg((sp // nb) || '.0', ',' ORDER BY bin) AS dmean,
      |             string_agg(((1000000 * sy) // nb) || '.0', ',' ORDER BY bin)
      |               AS dobs
      |      FROM bins),
      |ttl AS (SELECT 'Brier ' || bs.brier_u9 || ' u9 = REL ' || bs.rel_u9
      |          || ' - RES ' || bs.res_u9 || ' + UNC ' || bs.unc_u9
      |          || ' + WBV ' || bs.wbv_u9 || ' | AUC '
      |          || COALESCE(CAST(aucv.auc_ppm AS VARCHAR), 'na') || ' ppm'
      |            AS title
      |        FROM bs CROSS JOIN aucv)
      |SELECT '{"backgroundColor":"transparent","width":"750","height":"450","format":"png","chart":{"type":"bar","data":{"labels":['
      |  || s.labels || '],"datasets":[{"type":"bar","label":"Mean Predicted ppm","data":['
      |  || s.dmean
      |  || '],"fill":false,"borderColor":"rgb(54, 162, 235)","backgroundColor":"rgb(54, 162, 235)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},{"type":"bar","label":"Observed Rate ppm","data":['
      |  || s.dobs
      |  || '],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}]},"options":{"plugins":{"datalabels":{"display":true,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":false,"ticks":{"beginAtZero":true}}],"yAxes":[{"id":"left-y-axis","position":"left","stacked":false,"ticks":{"beginAtZero":true}}]},"title":{"display":true,"text":"'
      |  || ttl.title || '"}}}}' AS chart_json
      |FROM s CROSS JOIN ttl""".stripMargin
  ) { (s, dir) =>
    val rows = CurationQueries.calibrationBins.fn(s, dir)
      .agg(array_sort(collect_list(struct(col("bin"),
        col("mean_pred_ppm").cast("double").as("mp"),
        col("obs_rate_ppm").cast("double").as("ob")))).as("rs"))
      .select(
        expr("transform(rs, r -> CAST(r.bin AS STRING))").as("labels"),
        expr("transform(rs, r -> r.mp)").as("dmean"),
        expr("transform(rs, r -> r.ob)").as("dobs"))
    val brier = CurationQueries.brierDecomposition.fn(s, dir)
      .select("brier_u9", "rel_u9", "res_u9", "unc_u9", "wbv_u9")
    val auc = CurationQueries.rocAuc.fn(s, dir).select("auc_ppm")
    val title = concat(lit("Brier "), col("brier_u9").cast("string"),
      lit(" u9 = REL "), col("rel_u9").cast("string"),
      lit(" - RES "), col("res_u9").cast("string"),
      lit(" + UNC "), col("unc_u9").cast("string"),
      lit(" + WBV "), col("wbv_u9").cast("string"),
      lit(" | AUC "), coalesce(col("auc_ppm").cast("string"), lit("na")),
      lit(" ppm"))
    val ds = array(
      ChartJson.dataset(lit(ChartJson.Bar), lit("Mean Predicted ppm"),
        col("dmean"), lit(ChartJson.Blue)),
      ChartJson.dataset(lit(ChartJson.Bar), lit("Observed Rate ppm"),
        col("dobs"), lit(ChartJson.Red)))
    rows.crossJoin(broadcast(brier)).crossJoin(broadcast(auc))
      .select(ChartJson.requestJson(
        ChartJson.chartTitled(ChartJson.Bar, col("labels"), ds,
          displayLabels = true, title)).as("chart_json"))
  }

  /** q317: the FORECAST chart face (r13 verdict task 4) — q316's
    * Holt-Winters state series for the lexicographically-first event
    * type served as ONE byte-exact line ChartRequest: observed daily
    * count (milli), the smoothed LEVEL, and the honest pre-observation
    * one-step FORECAST (null on day 1 — rendered as a JSON null point,
    * which the chart idiom treats as a gap), with the NEXT-day
    * forecast l + b + s_next stamped into the data-dependent title —
    * the reference visualizer's own scheduled-extract pattern
    * (covid19-visualizer/.../Visualizer.java:288-319 builds exactly
    * this daily-vs-smoothed combo with a derived title window). Wired
    * as the `/forecast` [[graft.serve.HttpEndpoint]] route over THIS
    * registered, hash-oracled query. Makes the forecaster family
    * (q208/q211/q227/q285/q316) externally visible.
    *
    * No second recurrence to drift: the Spark side calls the
    * REGISTERED q316 fn verbatim and the oracle concatenates
    * [[CurationQueries.hwCtes]] (the ADVICE r12 shared-CTE rule).
    * s_next is the seasonal of the slot the NEXT day lands on,
    * w_next = m mod 7 (m = series length): slot w_next was last
    * written at series row m−6 (rows rn ≡ w_next+1 (mod 7) write it;
    * the init row's seasonal is 0, which is also the slot's true
    * pre-first-write value, so the m−6 lookup is exact for every m;
    * m−6 < 1 → 0). All numbers exact BIGINT millis rendered to
    * strings — byte equality is integer-exact end to end. One fold at
    * type grain + a chart-sized collect; nothing about the plan grows
    * with corpus size beyond q316 itself. */
  val forecastChart: Q = Q(
    "q317_forecast_chart",
    CurationQueries.hwCtes + """,
      |ty AS (SELECT min(event_type) AS ty FROM r),
      |h AS (SELECT r.*,
      |        row_number() OVER (ORDER BY r.day) AS rn2,
      |        count(*) OVER () AS m
      |      FROM r JOIN ty ON r.event_type = ty.ty),
      |s AS (SELECT string_agg('"' || strftime(day, '%b %d') || '"', ','
      |               ORDER BY day) AS labels,
      |             string_agg((n * 1000) || '.0', ',' ORDER BY day) AS obs,
      |             string_agg(l || '.0', ',' ORDER BY day) AS lev,
      |             string_agg(COALESCE(f || '.0', 'null'), ','
      |               ORDER BY day) AS fc
      |      FROM h),
      |nx AS (SELECT ty.ty,
      |         a.l + a.b + COALESCE(b6.sea, 0) AS fnext
      |       FROM h a CROSS JOIN ty
      |         LEFT JOIN h b6 ON b6.rn2 = a.m - 6
      |       WHERE a.rn2 = a.m)
      |SELECT '{"backgroundColor":"transparent","width":"750","height":"450","format":"png","chart":{"type":"line","data":{"labels":['
      |  || s.labels || '],"datasets":[{"type":"line","label":"Observed milli","data":['
      |  || s.obs
      |  || '],"fill":false,"borderColor":"rgb(201, 203, 207)","backgroundColor":"rgb(201, 203, 207)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},{"type":"line","label":"Level milli","data":['
      |  || s.lev
      |  || '],"fill":false,"borderColor":"rgb(54, 162, 235)","backgroundColor":"rgb(54, 162, 235)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},{"type":"line","label":"Forecast milli","data":['
      |  || s.fc
      |  || '],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}]},"options":{"plugins":{"datalabels":{"display":false,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":false,"ticks":{"beginAtZero":true}}],"yAxes":[{"id":"left-y-axis","position":"left","stacked":false,"ticks":{"beginAtZero":true}}]},"title":{"display":true,"text":"HW '
      |  || nx.ty || ' | next ' || nx.fnext || ' milli"}}}}' AS chart_json
      |FROM s CROSS JOIN nx""".stripMargin
  ) { (s, dir) =>
    val hw = CurationQueries.holtWinters.fn(s, dir)
    val ty = hw.agg(min(col("event_type")).as("ty"))
    val rows = hw.crossJoin(broadcast(ty))
      .filter(col("event_type") === col("ty"))
      .groupBy(col("ty"))
      .agg(array_sort(collect_list(struct(col("day"),
        date_format(col("day"), "MMM dd").as("label"),
        (col("n") * 1000).cast("double").as("obs"),
        col("level_milli").as("l"), col("trend_milli").as("b"),
        col("seasonal_milli").as("sea"),
        col("forecast_milli").cast("double").as("f")))).as("rs"))
      .select(col("ty"),
        expr("transform(rs, r -> r.label)").as("labels"),
        expr("transform(rs, r -> r.obs)").as("obs"),
        expr("transform(rs, r -> CAST(r.l AS DOUBLE))").as("lev"),
        expr("transform(rs, r -> r.f)").as("fc"),
        (element_at(col("rs"), size(col("rs"))).getField("l")
          + element_at(col("rs"), size(col("rs"))).getField("b")
          + when(size(col("rs")) >= 7,
              element_at(col("rs"), size(col("rs")) - 6).getField("sea"))
            .otherwise(lit(0L))).as("fnext"))
    val title = concat(lit("HW "), col("ty"), lit(" | next "),
      col("fnext").cast("string"), lit(" milli"))
    val ds = array(
      ChartJson.dataset(lit(ChartJson.Line), lit("Observed milli"),
        col("obs"), lit(ChartJson.Grey)),
      ChartJson.dataset(lit(ChartJson.Line), lit("Level milli"),
        col("lev"), lit(ChartJson.Blue)),
      ChartJson.dataset(lit(ChartJson.Line), lit("Forecast milli"),
        col("fc"), lit(ChartJson.Red)))
    rows.select(ChartJson.requestJson(
      ChartJson.chartTitled(ChartJson.Line, col("labels"), ds,
        displayLabels = false, title)).as("chart_json"))
  }

  val all: Seq[Q] = Seq(chartSeries, chartJson, chartFanout, historyChart,
    testingSeries, denseChartSeries, slaChart, calibrationChart,
    forecastChart)
}
