package graft.render

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Chart-request JSON assembly — the reference visualizer's egress
  * format, re-expressed as a nested StructType + `to_json`.
  *
  * The reference builds a `ChartRequest(Chart(ChartData(labels,
  * datasets), ChartOption(...)))` POJO tree and Gson-serializes it for
  * every scheduled chart (covid19-visualizer/.../charts/ChartRequest.java:12-17,
  * Chart.java:14-17, ChartData.java:14-17, ChartDataset.java:14-24,
  * ChartOption/ChartPlugin/ChartScale/ChartAxis/ChartTick/ChartTitle/
  * PluginDatalabel; serialization at visualizations/Visualizer.java:363,414
  * and VisualizationService.java:31-36).
  *
  * Gson serializes fields in declaration order with compact output and
  * `Double.toString` number formatting; Spark's `to_json` (Jackson) does
  * the same for struct fields declared in the same order, so the struct
  * layouts below reproduce the reference bytes exactly (golden-tested in
  * ChartJsonSpec).
  *
  * Scale posture: a chart is label-granular by construction (a handful
  * of days × a handful of series), so the final assembly is a one-row
  * aggregate over an ALREADY-REDUCED frame — the heavy lifting (daily
  * roll-ups, top-k) stays distributed; only chart-sized arrays are
  * collected.
  */
object ChartJson {

  /** Color palette (Visualizer.java:50-56). */
  val Blue = "rgb(54, 162, 235)"
  val Red = "rgb(255, 99, 132)"
  val Green = "rgb(75, 192, 192)"
  val Orange = "rgb(255, 159, 64)"
  val Yellow = "rgb(255, 205, 86)"
  val Purple = "rgb(153, 102, 255)"
  val Grey = "rgb(201, 203, 207)"

  /** Dataset color rotation for multi-series charts (Visualizer.java:196). */
  val TrendColors: Seq[String] = Seq(Red, Yellow, Green, Blue, Orange, Purple)

  val Line = "line"
  val Bar = "bar"
  /** The today/yesterday delta charts (Visualizer.java:426-525). */
  val HorizontalBar = "horizontalBar"

  /** One dataset — ChartDataset.java:14-24 field order, constructor
    * defaults from ChartDataset.java:26-37 (fill=false, background =
    * border color, borderWidth "3", barThickness "10", pointRadius "0").
    */
  def dataset(
      dsType: Column,
      label: Column,
      data: Column,
      borderColor: Column,
      yAxisID: Column = lit("left-y-axis")): Column =
    struct(
      dsType.as("type"),
      label.as("label"),
      data.as("data"),
      lit(false).as("fill"),
      borderColor.as("borderColor"),
      borderColor.as("backgroundColor"),
      lit("3").as("borderWidth"),
      lit("10").as("barThickness"),
      lit("0").as("pointRadius"),
      yAxisID.as("yAxisID"))

  /** One axis — ChartAxis.java:13-25 (ticks default beginAtZero=true). */
  def axis(id: String, position: String, stacked: Boolean,
      beginAtZero: Boolean = true): Column =
    struct(
      lit(id).as("id"),
      lit(position).as("position"),
      lit(stacked).as("stacked"),
      struct(lit(beginAtZero).as("beginAtZero")).as("ticks"))

  /** Default scales — ChartScale.java:19-22. */
  def defaultXAxes: Column = array(axis("bottom-x-axis", "bottom", stacked = false))
  def defaultYAxes: Column = array(axis("left-y-axis", "left", stacked = false))

  /** Chart node — Chart.java:14-17 with the constructor wiring at
    * Chart.java:19-41: PluginDatalabel(display, "end", "#ccc", "3",
    * "end"), ChartScale(xAxes, yAxes), ChartTitle(title.isDefined,
    * title.getOrElse("")).
    */
  def chart(
      chartType: String,
      labels: Column,
      datasets: Column,
      displayLabels: Boolean,
      xAxes: Column = defaultXAxes,
      yAxes: Column = defaultYAxes,
      title: Option[String] = None): Column =
    chartNode(chartType, labels, datasets, displayLabels, xAxes, yAxes,
      lit(title.isDefined), lit(title.getOrElse("")))

  /** [[chart]] with a DATA-DEPENDENT title (display=true) — the
    * calibration face (q303) embeds the Brier/AUC readout computed by
    * the query itself in the title text, the same way the reference's
    * visualizer stamps "last 7 days" date ranges into chart titles
    * (covid19-visualizer/.../Visualizer.java:288-319 builds the title
    * from the data window it just assembled). */
  def chartTitled(
      chartType: String,
      labels: Column,
      datasets: Column,
      displayLabels: Boolean,
      titleText: Column,
      xAxes: Column = defaultXAxes,
      yAxes: Column = defaultYAxes): Column =
    chartNode(chartType, labels, datasets, displayLabels, xAxes, yAxes,
      lit(true), titleText)

  private def chartNode(chartType: String, labels: Column, datasets: Column,
      displayLabels: Boolean, xAxes: Column, yAxes: Column,
      titleDisplay: Column, titleText: Column): Column =
    struct(
      lit(chartType).as("type"),
      struct(labels.as("labels"), datasets.as("datasets")).as("data"),
      struct(
        struct(
          struct(
            lit(displayLabels).as("display"),
            lit("end").as("anchor"),
            lit("#ccc").as("backgroundColor"),
            lit("3").as("borderRadius"),
            lit("end").as("align")).as("datalabels")).as("plugins"),
        struct(xAxes.as("xAxes"), yAxes.as("yAxes")).as("scales"),
        struct(
          titleDisplay.as("display"),
          titleText.as("text")).as("title")).as("options"))

  /** Request envelope — ChartRequest.java:12-17 with the defaults from
    * ChartRequest.java:19-26; the today/yesterday bar charts pass an
    * explicit 1000×600 (Visualizer.java:470,519). */
  def request(chartNode: Column, width: String = "750",
      height: String = "450"): Column =
    struct(
      lit("transparent").as("backgroundColor"),
      lit(width).as("width"),
      lit(height).as("height"),
      lit("png").as("format"),
      chartNode.as("chart"))

  /** Gson-equivalent JSON string of a full chart request
    * (VisualizationService.java:31-36). */
  def requestJson(chartNode: Column, width: String = "750",
      height: String = "450"): Column =
    to_json(request(chartNode, width, height))
}
