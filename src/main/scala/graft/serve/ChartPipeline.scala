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
    seriesCol.crossJoin(labelsCol)
      .withColumn("colors", colorArr)
      .select(
        lit(chartKey).as("key"),
        ChartJson.requestJson(
          ChartJson.chart(ChartJson.Line, col("labels"), datasets,
            displayLabels = false)).as("value"))
  }
}
