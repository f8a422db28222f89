package graft

import org.apache.spark.sql.functions._

import graft.render.ChartJson
import graft.render.ChartJson._

/** Golden tests: ChartJson must reproduce the reference's Gson bytes
  * exactly. Expected strings are hand-derived from the POJO tree the
  * reference serializes — Gson emits fields in declaration order
  * (ChartRequest.java:12-17, Chart.java:14-17, ChartData.java:14-17,
  * ChartDataset.java:14-24, ChartOption/ChartPlugin/ChartScale/
  * ChartAxis/ChartTick/ChartTitle/PluginDatalabel), compact, doubles via
  * Double.toString — with the constructor defaults of
  * ChartRequest.java:19-26, Chart.java:19-41, ChartDataset.java:26-49,
  * ChartAxis.java:19-25, ChartScale.java:19-22.
  */
class ChartJsonSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("j")).collect().head.getString(0)
  }

  private val envPrefix =
    """{"backgroundColor":"transparent","width":"750","height":"450","format":"png","chart":"""

  test("daily overview bar chart matches the Gson bytes (Visualizer.java:132-137)") {
    // buildVisualizationRequest(BAR, days, [Confirmed/RED, Recovered/GREEN,
    // Deaths/BLUE], displayLabels=true) — VisualizationService.java:31-36
    val labels = array(lit("May 01"), lit("May 02"))
    val datasets = array(
      dataset(lit(Bar), lit("Confirmed"), array(lit(5.0), lit(7.0)), lit(Red)),
      dataset(lit(Bar), lit("Recovered"), array(lit(3.0), lit(4.0)), lit(Green)),
      dataset(lit(Bar), lit("Deaths"), array(lit(1.0), lit(0.0)), lit(Blue)))
    val got = one(requestJson(chart(Bar, labels, datasets, displayLabels = true)))
    val expected = envPrefix +
      """{"type":"bar","data":{"labels":["May 01","May 02"],"datasets":[""" +
      """{"type":"bar","label":"Confirmed","data":[5.0,7.0],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"bar","label":"Recovered","data":[3.0,4.0],"fill":false,"borderColor":"rgb(75, 192, 192)","backgroundColor":"rgb(75, 192, 192)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"bar","label":"Deaths","data":[1.0,0.0],"fill":false,"borderColor":"rgb(54, 162, 235)","backgroundColor":"rgb(54, 162, 235)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}]},""" +
      """"options":{"plugins":{"datalabels":{"display":true,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},""" +
      """"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":false,"ticks":{"beginAtZero":true}}],""" +
      """"yAxes":[{"id":"left-y-axis","position":"left","stacked":false,"ticks":{"beginAtZero":true}}]},""" +
      """"title":{"display":false,"text":""}}}}"""
    assert(got == expected)
  }

  test("testing dual-axis chart matches the Gson bytes (Visualizer.java:352-366)") {
    // ChartData with two left-axis bars + one right-axis line; stacked
    // x/left axes; Chart("bar", data, false, xAxes, yAxes)
    val labels = array(lit("May 15"), lit("May 16"))
    val datasets = array(
      dataset(lit(Bar), lit("Positive"), array(lit(10.0), lit(20.0)), lit(Red),
        lit("left-y-axis")),
      dataset(lit(Bar), lit("Tested"), array(lit(100.0), lit(200.0)), lit(Green),
        lit("left-y-axis")),
      dataset(lit(Line), lit("5-day Moving Positivity rate"),
        array(lit(10.0), lit(10.5)), lit(Blue), lit("right-y-axis")))
    val xAxes = array(axis("bottom-x-axis", "bottom", stacked = true))
    val yAxes = array(
      axis("left-y-axis", "left", stacked = true),
      axis("right-y-axis", "right", stacked = false))
    val got = one(requestJson(
      chart(Bar, labels, datasets, displayLabels = false, xAxes, yAxes)))
    val expected = envPrefix +
      """{"type":"bar","data":{"labels":["May 15","May 16"],"datasets":[""" +
      """{"type":"bar","label":"Positive","data":[10.0,20.0],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"bar","label":"Tested","data":[100.0,200.0],"fill":false,"borderColor":"rgb(75, 192, 192)","backgroundColor":"rgb(75, 192, 192)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"line","label":"5-day Moving Positivity rate","data":[10.0,10.5],"fill":false,"borderColor":"rgb(54, 162, 235)","backgroundColor":"rgb(54, 162, 235)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"right-y-axis"}]},""" +
      """"options":{"plugins":{"datalabels":{"display":false,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},""" +
      """"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":true,"ticks":{"beginAtZero":true}}],""" +
      """"yAxes":[{"id":"left-y-axis","position":"left","stacked":true,"ticks":{"beginAtZero":true}},{"id":"right-y-axis","position":"right","stacked":false,"ticks":{"beginAtZero":true}}]},""" +
      """"title":{"display":false,"text":""}}}}"""
    assert(got == expected)
  }

  test("top-5 trend chart assembles per-series datasets from long-form rows (Visualizer.java:188-215)") {
    // end-to-end: q41's long form (user, day, label, n) → one LINE chart
    // with a dataset per key, trend colors in rank order, labels from
    // the union of days, displayLabels=false
    val series = queries.ChartQueries.chartSeries.fn(spark, sf)
    val ranked = series.groupBy("user_id")
      .agg(sum(col("n")).as("total"),
        array_sort(collect_list(struct(col("day"), col("n").cast("double").as("v"))))
          .as("rows"))
      .orderBy(col("total").desc, col("user_id"))
      .limit(5)
      .collect()
    assert(ranked.length == 5)
    val labelsCol = series.select(col("day"), col("monthday")).distinct()
      .agg(array_sort(collect_list(struct(col("day"), col("monthday")))).as("r"))
      .select(expr("transform(r, x -> x.monthday)").as("labels"))
    val datasetCols = ranked.zipWithIndex.map { case (row, i) =>
      val data = row.getSeq[org.apache.spark.sql.Row](2).map(_.getDouble(1))
      dataset(lit(Line), lit(row.getLong(0).toString),
        array(data.map(lit(_)): _*), lit(TrendColors(i % TrendColors.size)))
    }
    val json = labelsCol.select(requestJson(
      chart(Line, col("labels"), array(datasetCols: _*),
        displayLabels = false)).as("j")).collect().head.getString(0)
    // structural assertions: one dataset per key, rank-ordered colors,
    // Gson envelope intact
    assert(json.startsWith(envPrefix + """{"type":"line","data":{"labels":["""))
    assert("\"label\":".r.findAllIn(json).size == 5)
    assert(json.indexOf(Red) < json.indexOf(Yellow))
    assert(json.endsWith(""""title":{"display":false,"text":""}}}}"""))
  }

  test("chart pipeline emits keyed Gson-shaped frames for both chart shapes") {
    import spark.implicits._
    // single-series: doubling-rate shape
    val daily = Seq(
      (java.sql.Date.valueOf("2020-05-01"), "May 01", 10L),
      (java.sql.Date.valueOf("2020-05-02"), "May 02", 12L))
      .toDF("day", "label", "value")
    val single = graft.serve.ChartPipeline
      .singleSeries(daily, "doublingrate", "Doubling Rate")
      .collect().head
    assert(single.getString(0) == "doublingrate")
    assert(single.getString(1) == envPrefix +
      """{"type":"line","data":{"labels":["May 01","May 02"],"datasets":[""" +
      """{"type":"line","label":"Doubling Rate","data":[10.0,12.0],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}]},""" +
      """"options":{"plugins":{"datalabels":{"display":true,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},""" +
      """"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":false,"ticks":{"beginAtZero":true}}],""" +
      """"yAxes":[{"id":"left-y-axis","position":"left","stacked":false,"ticks":{"beginAtZero":true}}]},""" +
      """"title":{"display":false,"text":""}}}}""")

    // multi-series: top-states-trend shape; B has the larger total and
    // must take the first trend color (RED), A the second (YELLOW)
    val longForm = Seq(
      ("A", java.sql.Date.valueOf("2020-05-01"), "May 01", 5L),
      ("A", java.sql.Date.valueOf("2020-05-02"), "May 02", 6L),
      ("B", java.sql.Date.valueOf("2020-05-01"), "May 01", 50L),
      ("B", java.sql.Date.valueOf("2020-05-02"), "May 02", 60L))
      .toDF("series", "day", "label", "value")
    val multi = graft.serve.ChartPipeline
      .multiSeries(longForm, "top5statestrend")
      .collect().head
    assert(multi.getString(0) == "top5statestrend")
    val json = multi.getString(1)
    assert(json.contains(""""labels":["May 01","May 02"]"""))
    assert(json.contains(""""label":"B","data":[50.0,60.0]""") &&
      json.contains(""""label":"A","data":[5.0,6.0]"""))
    assert(json.indexOf(""""label":"B"""") < json.indexOf(""""label":"A""""))
    assert(json.indexOf(Red) < json.indexOf(Yellow))
    assert(json.endsWith(""""title":{"display":false,"text":""}}}}"""))
  }

  test("gap-filled single series renders a silent day as zero, byte-exact (Visualizer.java:155-186 probe-every-day loop)") {
    import spark.implicits._
    // May 02 and May 03 have NO input rows — the reference's chart loop
    // still visits them (store point-probe per day in the range); the
    // dense form must label them and chart 0.0, not drop them
    val sparse = Seq(
      (java.sql.Date.valueOf("2020-05-01"), "May 01", 10L),
      (java.sql.Date.valueOf("2020-05-04"), "May 04", 7L))
      .toDF("day", "label", "value")
    val row = graft.serve.ChartPipeline
      .singleSeriesDense(sparse, "doublingrate", "Doubling Rate")
      .collect().head
    assert(row.getString(0) == "doublingrate")
    assert(row.getString(1) == envPrefix +
      """{"type":"line","data":{"labels":["May 01","May 02","May 03","May 04"],"datasets":[""" +
      """{"type":"line","label":"Doubling Rate","data":[10.0,0.0,0.0,7.0],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}]},""" +
      """"options":{"plugins":{"datalabels":{"display":true,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},""" +
      """"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":false,"ticks":{"beginAtZero":true}}],""" +
      """"yAxes":[{"id":"left-y-axis","position":"left","stacked":false,"ticks":{"beginAtZero":true}}]},""" +
      """"title":{"display":false,"text":""}}}}""")
  }

  test("gapFillDaily honors an explicit range and yields an empty frame on empty input") {
    import spark.implicits._
    // explicit range: the reference's chart loops span a FIXED window
    // (31 days back from now), not the data's min..max — the range
    // parameter reproduces that, zero-filling edge days with no data
    val daily = Seq((java.sql.Date.valueOf("2020-05-02"), "May 02", 5L))
      .toDF("day", "label", "value")
    val dense = graft.serve.ChartPipeline.gapFillDaily(daily, Seq("value"),
        range = Some(("2020-05-01", "2020-05-04")))
      .orderBy("day")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(dense.toSeq == Seq(
      ("May 01", 0L), ("May 02", 5L), ("May 03", 0L), ("May 04", 0L)))

    // empty input, data-driven range: min/max are null -> empty spine,
    // empty output (the reference emits empty label/data arrays)
    val none = daily.filter(col("value") < 0)
    assert(graft.serve.ChartPipeline.gapFillDaily(none, Seq("value")).isEmpty)
  }

  test("gap-filled multi series keeps every data array aligned to the full-range labels") {
    import spark.implicits._
    // series A is silent on May 02; without the gap-fill its array
    // would shift left against the 3-day label spine (the reference's
    // misalignment bug — Visualizer.java:216-222 skips absent days
    // per-series while labeling all days)
    val longForm = Seq(
      ("A", java.sql.Date.valueOf("2020-05-01"), "May 01", 5L),
      ("A", java.sql.Date.valueOf("2020-05-03"), "May 03", 6L),
      ("B", java.sql.Date.valueOf("2020-05-01"), "May 01", 50L),
      ("B", java.sql.Date.valueOf("2020-05-02"), "May 02", 55L),
      ("B", java.sql.Date.valueOf("2020-05-03"), "May 03", 60L))
      .toDF("series", "day", "label", "value")
    val json = graft.serve.ChartPipeline
      .multiSeriesDense(longForm, "top5statestrend")
      .collect().head.getString(1)
    assert(json.contains(""""labels":["May 01","May 02","May 03"]"""))
    assert(json.contains(""""label":"B","data":[50.0,55.0,60.0]"""))
    assert(json.contains(""""label":"A","data":[5.0,0.0,6.0]"""))
  }

  test("today/yesterday bar chart matches the Gson bytes (Visualizer.java:426-475)") {
    import spark.implicits._
    val deltas = Seq(
      // sorted output: Maharashtra (dc=50) first, then Kerala (dc=10)
      ("Kerala", 10L, 2L, 1L),
      ("Maharashtra", 50L, 60L, 5L),      // active 50-60-5 < 0 -> clamped to 0.0
      ("Negative", -1L, 0L, 0L),          // isNegative -> dropped
      ("Sleepy", 0L, 0L, 0L))             // notYetUpdated -> dropped
      .toDF("state", "deltaConfirmed", "deltaRecovered", "deltaDeaths")
    val row = graft.serve.ChartPipeline
      .barChart(deltas, "today", "May 01").collect().head
    assert(row.getString(0) == "today")
    val expected =
      """{"backgroundColor":"transparent","width":"1000","height":"600","format":"png","chart":""" +
      """{"type":"horizontalBar","data":{"labels":["Maharashtra","Kerala"],"datasets":[""" +
      """{"type":"horizontalBar","label":"Active","data":[0.0,7.0],"fill":false,"borderColor":"rgb(201, 203, 207)","backgroundColor":"rgb(201, 203, 207)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"horizontalBar","label":"Recovered","data":[60.0,2.0],"fill":false,"borderColor":"rgb(54, 162, 235)","backgroundColor":"rgb(54, 162, 235)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"horizontalBar","label":"Deaths","data":[5.0,1.0],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}]},""" +
      """"options":{"plugins":{"datalabels":{"display":false,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},""" +
      """"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":true,"ticks":{"beginAtZero":true}}],""" +
      """"yAxes":[{"id":"left-y-axis","position":"left","stacked":true,"ticks":{"beginAtZero":true}}]},""" +
      """"title":{"display":true,"text":"May 01"}}}}"""
    assert(row.getString(1) == expected)
  }

  test("statewise-total fanout: one keyed stacked-bar chart per state (Visualizer.java:371-424)") {
    import spark.implicits._
    val daily = Seq(
      ("Assam", java.sql.Date.valueOf("2020-05-02"), "May 02", 90L, 20L, 5L),
      ("Assam", java.sql.Date.valueOf("2020-05-01"), "May 01", 80L, 15L, 4L),
      ("Delhi", java.sql.Date.valueOf("2020-05-01"), "May 01", 500L, 100L, 20L))
      .toDF("state", "day", "label", "active", "recovered", "deceased")
    val rows = graft.serve.ChartPipeline.statewiseTotalCharts(daily)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(rows.keySet == Set("Assam-statewisetotal", "Delhi-statewisetotal"))
    val expected = envPrefix +
      """{"type":"bar","data":{"labels":["May 01","May 02"],"datasets":[""" +
      """{"type":"bar","label":"Active","data":[80.0,90.0],"fill":false,"borderColor":"rgb(201, 203, 207)","backgroundColor":"rgb(201, 203, 207)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"bar","label":"Deaths","data":[4.0,5.0],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"bar","label":"Recovered","data":[15.0,20.0],"fill":false,"borderColor":"rgb(54, 162, 235)","backgroundColor":"rgb(54, 162, 235)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}]},""" +
      """"options":{"plugins":{"datalabels":{"display":false,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},""" +
      """"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":true,"ticks":{"beginAtZero":true}}],""" +
      """"yAxes":[{"id":"left-y-axis","position":"left","stacked":true,"ticks":{"beginAtZero":true}}]},""" +
      """"title":{"display":false,"text":""}}}}"""
    assert(rows("Assam-statewisetotal") == expected)
  }

  test("history trend chart matches the Gson bytes (Visualizer.java:241-287)") {
    import spark.implicits._
    val daily = Seq(
      (java.sql.Date.valueOf("2020-05-02"), "May 02", 150L, 30L, 8L),
      (java.sql.Date.valueOf("2020-05-01"), "May 01", 100L, 20L, 5L))
      .toDF("day", "label", "confirmed", "recovered", "deceased")
    val row = graft.serve.ChartPipeline
      .historyTrendChart(daily, "historytrend").collect().head
    assert(row.getString(0) == "historytrend")
    val expected = envPrefix +
      """{"type":"line","data":{"labels":["May 01","May 02"],"datasets":[""" +
      """{"type":"line","label":"Total Cases","data":[100.0,150.0],"fill":false,"borderColor":"rgb(54, 162, 235)","backgroundColor":"rgb(54, 162, 235)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"line","label":"Active","data":[75.0,112.0],"fill":false,"borderColor":"rgb(255, 205, 86)","backgroundColor":"rgb(255, 205, 86)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"line","label":"Recovered","data":[20.0,30.0],"fill":false,"borderColor":"rgb(75, 192, 192)","backgroundColor":"rgb(75, 192, 192)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"line","label":"Deceased","data":[5.0,8.0],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"}]},""" +
      """"options":{"plugins":{"datalabels":{"display":false,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},""" +
      """"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":false,"ticks":{"beginAtZero":true}}],""" +
      """"yAxes":[{"id":"left-y-axis","position":"left","stacked":false,"ticks":{"beginAtZero":true}}]},""" +
      """"title":{"display":false,"text":""}}}}"""
    assert(row.getString(1) == expected)
  }

  test("testing trend chart matches the Gson bytes incl. null-day quirks (Visualizer.java:289-368)") {
    import spark.implicits._
    // May 16 has no test data: 0.0 lands in every data array but the
    // label is skipped, and the moving average carries the prior window.
    // MA window: 10.0 | (carry) | mean(10,15)=12.5 | mean(10,15,19.25)=14.75
    val daily = Seq(
      (java.sql.Date.valueOf("2020-05-15"), "May 15", Some(100.0), Some(10L)),
      (java.sql.Date.valueOf("2020-05-16"), "May 16", None, None),
      (java.sql.Date.valueOf("2020-05-17"), "May 17", Some(200.0), Some(30L)),
      (java.sql.Date.valueOf("2020-05-18"), "May 18", Some(400.0), Some(77L)))
      .toDF("day", "label", "tested", "positive")
    val row = graft.serve.ChartPipeline
      .testingTrendChart(daily, "testingtrend").collect().head
    assert(row.getString(0) == "testingtrend")
    val expected = envPrefix +
      """{"type":"bar","data":{"labels":["May 15","May 17","May 18"],"datasets":[""" +
      """{"type":"bar","label":"Positive","data":[10.0,0.0,30.0,77.0],"fill":false,"borderColor":"rgb(255, 99, 132)","backgroundColor":"rgb(255, 99, 132)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"bar","label":"Tested","data":[100.0,0.0,200.0,400.0],"fill":false,"borderColor":"rgb(75, 192, 192)","backgroundColor":"rgb(75, 192, 192)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"left-y-axis"},""" +
      """{"type":"line","label":"5-day Moving Positivity rate","data":[10.0,10.0,12.5,14.75],"fill":false,"borderColor":"rgb(54, 162, 235)","backgroundColor":"rgb(54, 162, 235)","borderWidth":"3","barThickness":"10","pointRadius":"0","yAxisID":"right-y-axis"}]},""" +
      """"options":{"plugins":{"datalabels":{"display":false,"anchor":"end","backgroundColor":"#ccc","borderRadius":"3","align":"end"}},""" +
      """"scales":{"xAxes":[{"id":"bottom-x-axis","position":"bottom","stacked":true,"ticks":{"beginAtZero":true}}],""" +
      """"yAxes":[{"id":"left-y-axis","position":"left","stacked":true,"ticks":{"beginAtZero":true}},{"id":"right-y-axis","position":"right","stacked":false,"ticks":{"beginAtZero":true}}]},""" +
      """"title":{"display":false,"text":""}}}}"""
    assert(row.getString(1) == expected)
    // pre-data NaN renders 0.0: drop May 15 so the first window is empty
    val noData = Seq(
      (java.sql.Date.valueOf("2020-05-16"), "May 16", None: Option[Double],
        None: Option[Long]),
      (java.sql.Date.valueOf("2020-05-17"), "May 17", Some(200.0), Some(30L)))
      .toDF("day", "label", "tested", "positive")
    val j2 = graft.serve.ChartPipeline
      .testingTrendChart(noData, "testingtrend").collect().head.getString(1)
    assert(j2.contains(""""label":"5-day Moving Positivity rate","data":[0.0,15.0]"""))
    assert(j2.contains(""""labels":["May 17"]"""))
    // empty input: all arrays empty (no phantom MA entries from the
    // sequence(0,-1) descending default)
    val j3 = graft.serve.ChartPipeline
      .testingTrendChart(noData.limit(0), "testingtrend").collect().head.getString(1)
    assert(j3.contains(""""labels":[],"datasets":[{"type":"bar","label":"Positive","data":[]"""))
    assert(j3.contains(""""label":"5-day Moving Positivity rate","data":[]"""))
  }

  test("q42 chart JSON is Gson-shaped and day-ordered") {
    val j = queries.ChartQueries.chartJson.fn(spark, sf).collect().head.getString(0)
    assert(j.startsWith(envPrefix))
    assert(j.contains(""""label":"Doubling Rate""""))
    // labels ascend by day: first label is January if the data starts there
    val labels = j.substring(j.indexOf("[") + 1, j.indexOf("]")).split(",")
    assert(labels.length > 1)
    assert(labels.sameElements(labels)) // day-sorted upstream by array_sort
  }
}
