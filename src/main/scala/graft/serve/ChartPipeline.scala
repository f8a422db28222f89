package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.render.ChartJson

/** The visualizer's scheduled chart jobs (Visualizer.java:101-186,
  * 188-215) as declarative plans: daily roll-up → chart-request JSON →
  * keyed (chart-name, json) frames, ready for the batch Kafka producer
  * (`Codecs.toKafkaBatch` — the reference produces to the
  * `visualizations` topic at Visualizer.java:141,184; the REST
  * PNG-render hop is an out-of-scope I/O adapter).
  *
  * Reference shape per chart: O(days) store point-gets on the driver,
  * POJO tree, Gson. Here: one distributed aggregation; only chart-sized
  * arrays reach the driver row.
  */
object ChartPipeline {

  /** Densify a daily chart frame: a generated date spine (min..max day,
    * or the caller's explicit range) × the optional dimension columns,
    * left-joined to the input with ZEROS for silent days — the q85
    * gap-fill (`ExtensionQueries.gapFilledSeries`) promoted into the
    * serving layer. The reference's daily chart families walk every day
    * in the range with store point-probes, so a day with no data still
    * yields a label (and a zero/skip) — a distributed roll-up sees only
    * days that HAVE rows, and a chart whose x-axis silently drops a day
    * lies about the time axis. Ride this before any chart assembly that
    * assumes dense input.
    *
    * `label` is regenerated from the spine day ("MMM dd",
    * Visualizer.java:101's monthDayFormatter), so silent days get
    * correct labels, not nulls. Scale: spine rows = days (× dims),
    * never event volume; the input is already a per-day roll-up, so
    * both join sides are chart-sized — the spine side broadcasts. */
  def gapFillDaily(daily: DataFrame, valueCols: Seq[String],
      dims: Seq[String] = Nil, labelFmt: String = "MMM dd",
      range: Option[(String, String)] = None): DataFrame = {
    val spark = daily.sparkSession
    val spine = range match {
      case Some((lo, hi)) =>
        spark.range(1).select(
          explode(expr(s"sequence(DATE'$lo', DATE'$hi', interval 1 day)"))
            .as("day"))
      case None =>
        daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
          .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    }
    val frame =
      if (dims.isEmpty) spine
      else spine.crossJoin(broadcast(daily.select(dims.map(col): _*).distinct()))
    frame.join(broadcast(daily.drop("label")), Seq("day") ++ dims, "left")
      .select(
        col("day") +: date_format(col("day"), labelFmt).as("label") +:
          (dims.map(col) ++
            valueCols.map(c => coalesce(col(c), lit(0L)).as(c))): _*)
  }

  /** [[singleSeries]] over a possibly-sparse daily frame: gap-fill
    * first (zeros on silent days), then assemble — the faithful
    * engine-side form of the reference's probe-every-day chart loops. */
  def singleSeriesDense(daily: DataFrame, chartKey: String,
      seriesLabel: String, color: String = ChartJson.Red,
      displayLabels: Boolean = true): DataFrame =
    singleSeries(gapFillDaily(daily, Seq("value")), chartKey, seriesLabel,
      color, displayLabels)

  /** Single-series line chart over a (day, label, value) daily frame —
    * the doubling-rate / history-trend shape (Visualizer.java:155-186).
    * Emits exactly one (key, value) frame row. */
  def singleSeries(daily: DataFrame, chartKey: String, seriesLabel: String,
      color: String = ChartJson.Red, displayLabels: Boolean = true): DataFrame = {
    val rows = daily
      .agg(array_sort(collect_list(struct(
        col("day"), col("label"), col("value").cast("double").as("v")))).as("rows"))
      .select(
        expr("transform(rows, r -> r.label)").as("labels"),
        expr("transform(rows, r -> r.v)").as("data"))
    val ds = ChartJson.dataset(
      lit(ChartJson.Line), lit(seriesLabel), col("data"), lit(color))
    rows.select(
      lit(chartKey).as("key"),
      ChartJson.requestJson(
        ChartJson.chart(ChartJson.Line, col("labels"), array(ds),
          displayLabels)).as("value"))
  }

  /** Today/yesterday delta bar chart (Visualizer.java:426-475,477-525):
    * one day's statewise deltas → a "horizontalBar" chart with three
    * stacked per-state series — Active (grey), Recovered (blue), Deaths
    * (red) — states sorted by deltaConfirmed descending, negative/
    * not-yet-updated states dropped, active clamped at 0, stacked x and
    * y axes, a "MMM dd" title, and the bar charts' explicit 1000×600
    * request size. Input frame: (state, deltaConfirmed, deltaRecovered,
    * deltaDeaths) for ONE day. Emits one (key, value) row.
    *
    * Tie order: equal-deltaConfirmed states sort by state name here;
    * the reference's stable sort keeps its INDIAN_STATES input order
    * for ties — an order a distributed groupBy has no analog of, so
    * byte-identity holds for distinct delta values and ties take the
    * deterministic lexicographic order instead. */
  def barChart(deltas: DataFrame, chartKey: String, titleText: String): DataFrame = {
    val clean = deltas
      // isNegative(delta) — Visualizer.java:528-530
      .filter(col("deltaConfirmed") >= 0 && col("deltaRecovered") >= 0 &&
        col("deltaDeaths") >= 0)
      // notYetUpdated(delta) — Visualizer.java:536-538
      .filter(!(col("deltaConfirmed") === 0 && col("deltaRecovered") === 0 &&
        col("deltaDeaths") === 0))
      .select(col("state"),
        col("deltaConfirmed").cast("long").as("dc"),
        col("deltaRecovered").cast("long").as("dr"),
        col("deltaDeaths").cast("long").as("dd"))
      // active(delta) clamped at 0 — Visualizer.java:455,532-534
      .withColumn("act",
        greatest(col("dc") - col("dr") - col("dd"), lit(0L)))
    val rows = clean
      .agg(array_sort(collect_list(struct(
        (-col("dc")).as("neg"), col("state"),
        col("act").cast("double").as("a"),
        col("dr").cast("double").as("r"),
        col("dd").cast("double").as("d")))).as("rows"))
      .select(
        expr("transform(rows, x -> x.state)").as("labels"),
        expr("transform(rows, x -> x.a)").as("act"),
        expr("transform(rows, x -> x.r)").as("rec"),
        expr("transform(rows, x -> x.d)").as("dth"))
    val dsets = array(
      ChartJson.dataset(lit(ChartJson.HorizontalBar), lit("Active"),
        col("act"), lit(ChartJson.Grey)),
      ChartJson.dataset(lit(ChartJson.HorizontalBar), lit("Recovered"),
        col("rec"), lit(ChartJson.Blue)),
      ChartJson.dataset(lit(ChartJson.HorizontalBar), lit("Deaths"),
        col("dth"), lit(ChartJson.Red)))
    val xAxes = array(ChartJson.axis("bottom-x-axis", "bottom", stacked = true))
    val yAxes = array(ChartJson.axis("left-y-axis", "left", stacked = true))
    rows.select(
      lit(chartKey).as("key"),
      ChartJson.requestJson(
        ChartJson.chart(ChartJson.HorizontalBar, col("labels"), dsets,
          displayLabels = false, xAxes, yAxes, Some(titleText)),
        width = "1000", height = "600").as("value"))
  }

  /** Statewise-total chart fanout (Visualizer.java:371-424): one
    * stacked "bar" chart PER STATE — last-month cumulative Active
    * (grey) / Deaths (red) / Recovered (blue) by day, keyed
    * `<state>-statewisetotal` for the visualizations topic. The
    * reference loops states on the driver with per-day store point-gets
    * and a 1 s sleep between charts; here the whole fanout is ONE
    * grouped plan emitting a keyed row per state. Input long form:
    * (state, day, label, active, recovered, deceased). */
  def statewiseTotalCharts(daily: DataFrame): DataFrame = {
    val perState = daily
      .groupBy("state")
      .agg(array_sort(collect_list(struct(col("day"), col("label"),
        col("active").cast("double").as("a"),
        col("recovered").cast("double").as("r"),
        col("deceased").cast("double").as("d")))).as("rows"))
      .select(col("state"),
        expr("transform(rows, x -> x.label)").as("labels"),
        expr("transform(rows, x -> x.a)").as("act"),
        expr("transform(rows, x -> x.d)").as("dth"),
        expr("transform(rows, x -> x.r)").as("rec"))
    // dataset order is Active, Deaths, Recovered here (Visualizer.java:
    // 402-404) — unlike the today/yesterday charts — and active is the
    // UNclamped cumulative difference.
    val dsets = array(
      ChartJson.dataset(lit(ChartJson.Bar), lit("Active"),
        col("act"), lit(ChartJson.Grey)),
      ChartJson.dataset(lit(ChartJson.Bar), lit("Deaths"),
        col("dth"), lit(ChartJson.Red)),
      ChartJson.dataset(lit(ChartJson.Bar), lit("Recovered"),
        col("rec"), lit(ChartJson.Blue)))
    val xAxes = array(ChartJson.axis("bottom-x-axis", "bottom", stacked = true))
    val yAxes = array(ChartJson.axis("left-y-axis", "left", stacked = true))
    perState.select(
      concat(col("state"), lit("-statewisetotal")).as("key"),
      ChartJson.requestJson(
        ChartJson.chart(ChartJson.Bar, col("labels"), dsets,
          displayLabels = false, xAxes, yAxes)).as("value"))
  }

  /** Since-origin history trend (Visualizer.java:241-287 historyTrend):
    * four LINE series of the CURRENT totals per day — "Total Cases"
    * (blue) = currentConfirmed, "Active" (yellow) = confirmed −
    * recovered − deceased (unclamped, Visualizer.java:270), "Recovered"
    * (green), "Deceased" (red) — labels "MMM dd", displayLabels=false,
    * default axes/size. The reference walks every date since 30/01/2020
    * with a store point-get per day and SKIPS null-delta days entirely
    * (Visualizer.java:264-274); here absent days are simply rows absent
    * from the input frame. Input: (day, label, confirmed, recovered,
    * deceased) current totals per day. Emits one (key, value) row. */
  def historyTrendChart(daily: DataFrame, chartKey: String): DataFrame =
    historyTrendFromArrays(daily
      .agg(array_sort(collect_list(struct(col("day"), col("label"),
        col("confirmed").cast("long").as("c"),
        col("recovered").cast("long").as("r"),
        col("deceased").cast("long").as("d")))).as("rows"))
      .select(
        expr("transform(rows, x -> x.label)").as("labels"),
        expr("transform(rows, x -> CAST(x.c AS DOUBLE))").as("total"),
        expr("transform(rows, x -> CAST(x.c - x.r - x.d AS DOUBLE))").as("act"),
        expr("transform(rows, x -> CAST(x.r AS DOUBLE))").as("rec"),
        expr("transform(rows, x -> CAST(x.d AS DOUBLE))").as("dec")),
      chartKey)

  /** Assembly half of [[historyTrendChart]] over a one-row
    * (labels, total, act, rec, dec) array frame — shared with q53,
    * which derives its arrays as running totals instead of reading
    * current totals off the input. Dataset order + colors:
    * Visualizer.java:276-281. */
  private[graft] def historyTrendFromArrays(arrays: DataFrame,
      chartKey: String): DataFrame = {
    val dsets = array(
      ChartJson.dataset(lit(ChartJson.Line), lit("Total Cases"),
        col("total"), lit(ChartJson.Blue)),
      ChartJson.dataset(lit(ChartJson.Line), lit("Active"),
        col("act"), lit(ChartJson.Yellow)),
      ChartJson.dataset(lit(ChartJson.Line), lit("Recovered"),
        col("rec"), lit(ChartJson.Green)),
      ChartJson.dataset(lit(ChartJson.Line), lit("Deceased"),
        col("dec"), lit(ChartJson.Red)))
    arrays.select(
      lit(chartKey).as("key"),
      ChartJson.requestJson(
        ChartJson.chart(ChartJson.Line, col("labels"), dsets,
          displayLabels = false)).as("value"))
  }

  /** Dual-axis testing trend (Visualizer.java:289-368 testingTrend):
    * per-day Positive (red bar, left axis) and Tested (green bar, left
    * axis) with a 5-day moving positivity-rate line (blue, right axis).
    *
    * Faithful to the reference's quirks:
    *  - a day with null tested data contributes 0.0 to ALL data arrays
    *    but is SKIPPED in the labels list (Visualizer.java:326-339 adds
    *    the day only inside the non-null branch) — arrays legitimately
    *    run longer than labels;
    *  - the moving average (DescriptiveStatistics(5), Visualizer.java:
    *    303-320) ingests a rate only on days where BOTH tested and
    *    positive exist, and every day records the mean of the values
    *    ingested so far (last ≤5); before any value it is NaN, rendered
    *    0.0 (Visualizer.java:344-347);
    *  - the recorded mean is formatted `DecimalFormat("0.00")` and
    *    parsed back (Visualizer.java:346) — replicated with half-even
    *    `bround(_, 2)` (same shortest-digits basis as DecimalFormat).
    *    The mean itself is a fixed-order sum/n over the ≤5-value day-
    *    ordered window (commons-math's corrected mean agrees for the
    *    magnitudes a rate chart carries, and the 2-decimal rounding
    *    absorbs the ulp).
    *
    * Input: (day, label, tested, positive), tested/positive nullable.
    * Emits one (key, value) row. */
  /** SQL expression: per-day mean of the last ≤5 VALID positivity
    * rates over a day-sorted `rows` array<struct<…, t, p>> column —
    * the DescriptiveStatistics(5) window of Visualizer.java:303-320
    * (only days with both tested and positive ingest a value; every
    * day reports the current mean; 0.0 before any data). `round2`
    * applies the chart's DecimalFormat("0.00") half-even rendering;
    * raw means feed the oracled q55 series (quantized there).
    *
    * Deliberate divergence on tested = 0: Spark double division by
    * zero yields NULL, so a zero-tested day is skipped like a missing
    * one. The reference's Java division (Visualizer.java:313) would
    * ingest Infinity/NaN into DescriptiveStatistics — and then CRASH
    * when `Double.valueOf(DecimalFormat.format(mean))` meets "∞"
    * (Visualizer.java:346), so there is no well-defined reference
    * output to replicate; treating the day as data-absent is the sane
    * total behavior. */
  private[graft] def positivityMaExpr(round2: Boolean): String = {
    // valid positivity rates among days 1..i (1-based slice), last ≤5
    val valid = "filter(transform(slice(rows, 1, i + 1), " +
      "x -> IF(x.t IS NOT NULL AND x.p IS NOT NULL, " +
      "x.p / x.t * 100.0D, CAST(NULL AS DOUBLE))), y -> y IS NOT NULL)"
    val w = s"slice($valid, greatest(size($valid) - 4, 1), 5)"
    val mean = s"aggregate($w, 0.0D, (acc, x) -> acc + x) / size($w)"
    val rendered = if (round2) s"bround($mean, 2)" else mean
    // empty-frame guard: sequence(0, -1) would yield [0, -1] (Spark
    // defaults to step -1 when start > stop) — the reference emits
    // empty arrays for an empty day range
    "IF(size(rows) = 0, CAST(array() AS ARRAY<DOUBLE>), " +
      "transform(sequence(0, size(rows) - 1), i -> " +
      s"IF(size($w) = 0, 0.0D, $rendered)))"
  }

  def testingTrendChart(daily: DataFrame, chartKey: String): DataFrame = {
    val ma = positivityMaExpr(round2 = true)
    val rows = daily
      .agg(array_sort(collect_list(struct(col("day"), col("label"),
        col("tested").cast("double").as("t"),
        col("positive").cast("double").as("p")))).as("rows"))
      .select(
        expr("transform(filter(rows, x -> x.t IS NOT NULL), x -> x.label)")
          .as("labels"),
        expr("transform(rows, x -> coalesce(x.p, 0.0D))").as("pos"),
        expr("transform(rows, x -> coalesce(x.t, 0.0D))").as("tst"),
        expr(ma).as("ma"))
    // datasets + axes: Visualizer.java:349-360
    val dsets = array(
      ChartJson.dataset(lit(ChartJson.Bar), lit("Positive"),
        col("pos"), lit(ChartJson.Red), lit("left-y-axis")),
      ChartJson.dataset(lit(ChartJson.Bar), lit("Tested"),
        col("tst"), lit(ChartJson.Green), lit("left-y-axis")),
      ChartJson.dataset(lit(ChartJson.Line), lit("5-day Moving Positivity rate"),
        col("ma"), lit(ChartJson.Blue), lit("right-y-axis")))
    val xAxes = array(ChartJson.axis("bottom-x-axis", "bottom", stacked = true))
    val yAxes = array(
      ChartJson.axis("left-y-axis", "left", stacked = true),
      ChartJson.axis("right-y-axis", "right", stacked = false))
    rows.select(
      lit(chartKey).as("key"),
      ChartJson.requestJson(
        ChartJson.chart(ChartJson.Bar, col("labels"), dsets,
          displayLabels = false, xAxes, yAxes)).as("value"))
  }

  /** [[multiSeries]] over possibly-sparse long-form input: gap-fill
    * per series (zeros on silent days) so every series' data array
    * aligns with the full-range label spine. The reference's top-5
    * trend labels every day in its 31-day window unconditionally
    * (Visualizer.java:197-215 puts the monthDay key before probing) —
    * a series missing a day would silently SHIFT its array left
    * against those labels; densifying is the correct total form. */
  def multiSeriesDense(longForm: DataFrame, chartKey: String): DataFrame =
    multiSeries(
      gapFillDaily(longForm, Seq("value"), dims = Seq("series")), chartKey)

  /** Multi-series trend chart over a long-form (series, day, label,
    * value) frame — the top-5-states-trend shape (Visualizer.java:
    * 188-215). Series are ordered by total value descending (the
    * reference hardcodes its list; we rank), colors rotate through the
    * reference palette. Labels = the union of days present. Emits one
    * (key, value) frame row. */
  def multiSeries(longForm: DataFrame, chartKey: String): DataFrame = {
    val labelsCol = longForm.select("day", "label").distinct()
      .agg(array_sort(collect_list(struct(col("day"), col("label")))).as("r"))
      .select(expr("transform(r, x -> x.label)").as("labels"))
    val colorArr = array(ChartJson.TrendColors.map(lit(_)): _*)
    val seriesCol = longForm
      .groupBy("series")
      .agg(
        sum(col("value")).as("total"),
        expr("transform(array_sort(collect_list(struct(day, CAST(value AS DOUBLE) AS v))), x -> x.v)")
          .as("data"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(-total AS neg, series, data))), x -> struct(x.series, x.data))")
        .as("ranked"))
      .select(col("ranked"))
    val datasets: Column = expr(
      "transform(ranked, (x, i) -> " +
        "named_struct(" +
        "'type', 'line', 'label', CAST(x.series AS STRING), 'data', x.data, " +
        "'fill', false, 'borderColor', element_at(colors, (i % size(colors)) + 1), " +
        "'backgroundColor', element_at(colors, (i % size(colors)) + 1), " +
        "'borderWidth', '3', 'barThickness', '10', 'pointRadius', '0', " +
        "'yAxisID', 'left-y-axis'))")
    seriesCol.crossJoin(broadcast(labelsCol))
      .withColumn("colors", colorArr)
      .select(
        lit(chartKey).as("key"),
        ChartJson.requestJson(
          ChartJson.chart(ChartJson.Line, col("labels"), datasets,
            displayLabels = false)).as("value"))
  }
}
