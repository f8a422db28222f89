package graft.render

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Engine-side PNG rendering of the chart-request JSON — the half of
  * the reference's visualization path that lived OUTSIDE the engine: the
  * reference POSTs the Gson chart request to an external quickchart
  * service and stores the PNG it gets back
  * (covid19-visualizer/.../VisualizationService.java:39-45). The JDK's
  * own ImageIO + Graphics2D cover that hop in-process, so the engine's
  * byte-exact chart JSON (ChartJson, golden-tested) renders to a PNG
  * without an egress dependency.
  *
  * Rendering contract (matches the request fields the reference sets):
  * canvas is `width`×`height` with a TRANSPARENT background
  * (`backgroundColor: "transparent"`, ChartRequest.java:19-26), the
  * chart type plus per-dataset type overrides pick line / bar /
  * horizontalBar marks, series colors parse from the Chart.js
  * `rgb(r, g, b)` strings, axes begin at zero (ChartAxis ticks
  * default), and the optional title renders centered on top. This is a
  * faithful renderer, not a pixel-clone of Chart.js — the spec gates on
  * decoded canvas dimensions, per-series colored-pixel evidence, and
  * determinism, which is what "the visualizer stored a usable PNG of
  * this exact request" requires.
  *
  * Scale posture: rendering is a narrow per-row map (one chart request
  * → one PNG, no shuffle) behind `renderCharts`; chart requests are
  * label-granular by construction (a few dozen points), so the image
  * work per row is microseconds-to-milliseconds and runs wherever the
  * row lives — the driver never collects anything.
  */
object ChartPng {

  private val RgbRe = """rgb\s*\(\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  private[graft] def parseColor(s: String): Color = s match {
    case RgbRe(r, g, b) => new Color(r.toInt, g.toInt, b.toInt)
    case h if h.startsWith("#") && h.length == 4 =>
      def c(i: Int) = Integer.parseInt(h.substring(i, i + 1) * 2, 16)
      new Color(c(1), c(2), c(3))
    case h if h.startsWith("#") && h.length == 7 =>
      new Color(Integer.parseInt(h.substring(1), 16))
    case _ => new Color(201, 203, 207) // ChartJson.Grey
  }

  private final case class Series(kind: String, label: String,
      data: Array[Double], color: Color, yAxis: String)

  /** Render one chart-request JSON (ChartJson.requestJson output) to
    * PNG bytes. Pure function of the JSON string — byte-deterministic,
    * so golden assertions and dedup on the output are stable. */
  def render(requestJson: String): Array[Byte] = {
    val root = new ObjectMapper().readTree(requestJson)
    val w = root.path("width").asText("750").toInt
    val h = root.path("height").asText("450").toInt
    val chart = root.path("chart")
    val chartType = chart.path("type").asText("line")
    val data = chart.path("data")
    val labels = asSeq(data.path("labels")).map(_.asText())
    val series = asSeq(data.path("datasets")).map { d =>
      Series(
        if (d.path("type").isMissingNode) chartType else d.path("type").asText(chartType),
        d.path("label").asText(""),
        asSeq(d.path("data")).map(_.asDouble()).toArray,
        parseColor(d.path("borderColor").asText("")),
        d.path("yAxisID").asText("left-y-axis"))
    }
    val titleNode = chart.path("options").path("title")
    val title =
      if (titleNode.path("display").asBoolean(false)) Some(titleNode.path("text").asText(""))
      else None
    val scales = chart.path("options").path("scales")
    val xStacked = asSeq(scales.path("xAxes")).headOption
      .exists(_.path("stacked").asBoolean(false))
    val yStacked = asSeq(scales.path("yAxes"))
      .map(a => a.path("id").asText("left-y-axis") ->
        a.path("stacked").asBoolean(false)).toMap
    renderChart(w, h, chartType, labels, series, title, xStacked, yStacked)
  }

  private def asSeq(n: JsonNode): Seq[JsonNode] =
    (0 until n.size()).map(n.get)

  private def clean(v: Double): Double =
    if (v.isNaN || v.isInfinite) 0.0 else math.max(0.0, v)

  private def renderChart(w: Int, h: Int, chartType: String,
      labels: Seq[String], series: Seq[Series], title: Option[String],
      xStacked: Boolean, yStacked: Map[String, Boolean]): Array[Byte] = {
    require(w >= 40 && h >= 40, s"canvas ${w}x$h too small to chart")
    // transparent background: ARGB canvas, alpha stays 0 where nothing
    // is drawn — the request's backgroundColor contract
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_OFF) // bit-stable output
      val axis = new Color(120, 120, 120)
      val top = if (title.isDefined) 28 else 12
      val hasRight = series.exists(_.yAxis == "right-y-axis") &&
        chartType != "horizontalBar"
      val (left, right, bottom) = (46, if (hasRight) 46 else 12, 26)
      val (x0, y0, x1, y1) = (left, top, w - right, h - bottom)
      title.foreach { t =>
        g.setColor(axis)
        g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 13))
        val fm = g.getFontMetrics
        g.drawString(t, math.max(0, (w - fm.stringWidth(t)) / 2), 18)
      }
      g.setColor(axis)
      g.drawLine(x0, y1, x1, y1) // x axis
      g.drawLine(x0, y0, x0, y1) // y axis
      if (hasRight) g.drawLine(x1, y0, x1, y1)
      val n = math.max(1, labels.size)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 10))
      val fm = g.getFontMetrics
      def axisMax(axisId: String): Double = {
        val own = series.filter(_.yAxis == axisId)
        val stacked = yStacked.getOrElse(axisId, false)
        // Chart.js stacking applies to BAR datasets; lines overlay at
        // their own values on the same axis
        val bars = own.filter(_.kind != "line")
        val barMax =
          if (bars.isEmpty) 0.0
          else if (stacked)
            (0 until n).iterator
              .map(i => bars.map(s => clean(s.data.lift(i).getOrElse(0.0))).sum)
              .foldLeft(0.0)(math.max)
          else bars.iterator.flatMap(_.data).map(clean).foldLeft(0.0)(math.max)
        val lineMax = own.filter(_.kind == "line").iterator
          .flatMap(_.data).map(clean).foldLeft(0.0)(math.max)
        val m = math.max(barMax, lineMax)
        if (m <= 0.0) 1.0 else m
      }
      if (chartType == "horizontalBar") {
        // value axis horizontal; stacked requests (the today/yesterday
        // delta charts set both axes stacked) draw one composite bar
        // per label, segments in dataset order
        val vMax =
          if (xStacked)
            (0 until n).iterator
              .map(i => series.map(s => clean(s.data.lift(i).getOrElse(0.0))).sum)
              .foldLeft(0.0)(math.max).max(1e-9)
          else axisMax("left-y-axis")
        (0 to 4).foreach { t =>
          val v = vMax * t / 4
          val x = x0 + ((x1 - x0).toLong * t / 4).toInt
          g.setColor(axis)
          g.drawLine(x, y1, x, y1 + 3)
          g.drawString(fmtTick(v), x - 8, y1 + 14)
        }
        val rowH = (y1 - y0).toDouble / n
        if (xStacked) {
          (0 until n).foreach { i =>
            var off = 0
            val y = y0 + (i * rowH).toInt + 2
            val bh = math.max(2, math.min(10, rowH.toInt - 4))
            series.foreach { s =>
              val vv = clean(s.data.lift(i).getOrElse(0.0))
              val len = ((x1 - x0) * vv / vMax).toInt
              if (len > 0 || vv > 0) {
                g.setColor(s.color)
                g.fillRect(x0 + 1 + off, y, math.max(1, len), bh)
                off += math.max(1, len)
              }
            }
          }
        } else series.zipWithIndex.foreach { case (s, si) =>
          g.setColor(s.color)
          s.data.take(n).zipWithIndex.foreach { case (v, i) =>
            val vv = clean(v)
            val len = ((x1 - x0) * vv / vMax).toInt
            val y = y0 + (i * rowH).toInt + 2 + si * 11
            g.fillRect(x0 + 1, y, math.max(if (vv > 0) 1 else 0, len), 10)
          }
        }
        g.setColor(axis)
        labels.take(n).zipWithIndex.foreach { case (l, i) =>
          val y = y0 + ((i + 0.5) * rowH).toInt + 4
          g.drawString(abbrev(l, 7), 2, y)
        }
      } else {
        val leftMax = axisMax("left-y-axis")
        val rightMax = axisMax("right-y-axis")
        (0 to 4).foreach { t =>
          val y = y1 - ((y1 - y0).toLong * t / 4).toInt
          g.setColor(axis)
          g.drawLine(x0 - 3, y, x0, y)
          g.drawString(fmtTick(leftMax * t / 4), 2, y + 4)
          if (hasRight) {
            g.drawLine(x1, y, x1 + 3, y)
            g.drawString(fmtTick(rightMax * t / 4), x1 + 5, y + 4)
          }
        }
        // x labels: sample so they never overlap
        val step = math.max(1, n / math.max(1, (x1 - x0) / 60))
        g.setColor(axis)
        labels.zipWithIndex.foreach { case (l, i) =>
          if (i % step == 0) {
            val x = xPos(x0, x1, n, i)
            g.drawString(abbrev(l, 10), x - fm.stringWidth(abbrev(l, 10)) / 2, y1 + 14)
          }
        }
        def yPos(v: Double, axisId: String): Int = {
          val m = if (axisId == "right-y-axis") rightMax else leftMax
          y1 - ((y1 - y0) * clean(v) / m).toInt
        }
        // stacked bars accumulate per label across the BAR datasets of
        // a stacked axis, in dataset order
        val stackOff = new Array[Int](n)
        series.zipWithIndex.foreach { case (s, si) =>
          g.setColor(s.color)
          if (s.kind == "bar") {
            val stacked = yStacked.getOrElse(s.yAxis, false)
            s.data.take(n).zipWithIndex.foreach { case (v, i) =>
              val hpx = ((y1 - y0) * clean(v) /
                (if (s.yAxis == "right-y-axis") rightMax else leftMax)).toInt
              if (stacked) {
                val yTop = y1 - stackOff(i) - hpx
                g.fillRect(xPos(x0, x1, n, i) - 5, yTop, 10,
                  math.max(if (clean(v) > 0) 1 else 0, hpx))
                stackOff(i) += hpx
              } else {
                val x = xPos(x0, x1, n, i) - 5 + si * 11 -
                  (series.count(_.kind == "bar") - 1) * 5
                g.fillRect(x, y1 - hpx, 10,
                  math.max(if (clean(v) > 0) 1 else 0, hpx))
              }
            }
          } else { // line (the default mark)
            g.setStroke(new BasicStroke(3f)) // ChartDataset borderWidth "3"
            var prev: Option[(Int, Int)] = None
            s.data.take(n).zipWithIndex.foreach { case (v, i) =>
              val p = (xPos(x0, x1, n, i), yPos(v, s.yAxis))
              prev.foreach { q => g.drawLine(q._1, q._2, p._1, p._2) }
              prev = Some(p)
            }
            if (s.data.length == 1) { // single point: dot, no segment
              val p = (xPos(x0, x1, n, 0), yPos(s.data(0), s.yAxis))
              g.fillRect(p._1 - 1, p._2 - 1, 3, 3)
            }
            g.setStroke(new BasicStroke(1f))
          }
        }
      }
    } finally g.dispose()
    val baos = new ByteArrayOutputStream(8192)
    ImageIO.setUseCache(false)
    require(ImageIO.write(img, "png", baos), "no PNG writer in this JVM")
    baos.toByteArray
  }

  private def xPos(x0: Int, x1: Int, n: Int, i: Int): Int =
    if (n == 1) (x0 + x1) / 2
    else x0 + ((x1 - x0).toLong * i / (n - 1)).toInt

  private def fmtTick(v: Double): String =
    if (v >= 1000000) f"${v / 1000000}%.1fM"
    else if (v >= 1000) f"${v / 1000}%.1fk"
    else if (v == v.floor) v.toLong.toString
    else f"$v%.1f"

  private def abbrev(s: String, n: Int): String =
    if (s.length <= n) s else s.take(n - 1) + "…"

  /** Distributed render: every row's `jsonCol` chart request → a `png`
    * binary column, as a narrow per-row map (charts render where their
    * rows live; nothing is collected). The engine-side replacement for
    * the reference's per-chart REST round-trip. */
  def renderCharts(requests: DataFrame, keyCol: String,
      jsonCol: String): DataFrame = {
    val spark = requests.sparkSession
    import spark.implicits._
    requests.select(col(keyCol).cast("string"), col(jsonCol))
      .as[(String, String)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (k, j) => (k, render(j)) }
      }.toDF(keyCol, "png")
  }
}
