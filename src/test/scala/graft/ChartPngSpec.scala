package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.render.ChartPng

/** Engine-side PNG rendering of the byte-exact chart JSON — the hop the
  * reference delegates to an external REST service
  * (VisualizationService.java:39-45). Golden-dimensions gates: the PNG
  * decodes, the canvas is exactly the requested size, each series
  * leaves pixels of ITS OWN declared color on a transparent background,
  * and rendering is byte-deterministic. */
class ChartPngSpec extends SparkSpec {

  private def decode(png: Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    assert(img != null, "renderer emitted an undecodable PNG")
    img
  }

  private def colorCount(img: java.awt.image.BufferedImage, r: Int, g: Int, b: Int): Int = {
    var n = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      if ((p >>> 24) != 0 && ((p >> 16) & 0xff) == r &&
        ((p >> 8) & 0xff) == g && (p & 0xff) == b) n += 1
    }
    n
  }

  private def opaqueCount(img: java.awt.image.BufferedImage): Int = {
    var n = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      if ((img.getRGB(x, y) >>> 24) != 0) n += 1
    n
  }

  test("line chart request renders at the default 750x450 with the series color on transparent") {
    import spark.implicits._
    val daily = Seq(
      (java.sql.Date.valueOf("2020-05-01"), "May 01", 10L),
      (java.sql.Date.valueOf("2020-05-02"), "May 02", 12L),
      (java.sql.Date.valueOf("2020-05-03"), "May 03", 7L))
      .toDF("day", "label", "value")
    val json = graft.serve.ChartPipeline
      .singleSeries(daily, "doublingrate", "Doubling Rate")
      .collect().head.getString(1)
    val png = ChartPng.render(json)
    val img = decode(png)
    assert(img.getWidth == 750 && img.getHeight == 450,
      s"requested 750x450, decoded ${img.getWidth}x${img.getHeight}")
    // the series is Red rgb(255, 99, 132) with stroke width 3 across the
    // plot area — hundreds of pixels of exactly that color
    assert(colorCount(img, 255, 99, 132) > 200, "line series color missing")
    // transparent background: most of the canvas stays alpha-0
    val opaque = opaqueCount(img)
    assert(opaque > 500 && opaque < 750 * 450 / 2,
      s"$opaque opaque pixels — background must stay transparent")
    // byte-deterministic (the property dedup/goldens on PNGs ride on)
    assert(ChartPng.render(json).toSeq == png.toSeq)
    // different data must render different bytes
    val json2 = graft.serve.ChartPipeline
      .singleSeries(daily.withColumn("value", col("value") * 3),
        "doublingrate", "Doubling Rate")
      .collect().head.getString(1)
    assert(ChartPng.render(json2).toSeq != png.toSeq)
  }

  test("horizontalBar chart renders at its explicit 1000x600 with all three series colors and a title") {
    import spark.implicits._
    val deltas = Seq(
      ("Kerala", 120L, 40L, 3L),
      ("Delhi", 80L, 30L, 2L),
      ("Goa", 10L, 5L, 1L))
      .toDF("state", "deltaConfirmed", "deltaRecovered", "deltaDeaths")
    val json = graft.serve.ChartPipeline
      .barChart(deltas, "today", "May 01").collect().head.getString(1)
    val img = decode(ChartPng.render(json))
    assert(img.getWidth == 1000 && img.getHeight == 600)
    // Active grey, Recovered blue, Deaths red — each dataset must leave
    // bar pixels of its own color
    assert(colorCount(img, 201, 203, 207) > 50, "Active (grey) bars missing")
    assert(colorCount(img, 54, 162, 235) > 50, "Recovered (blue) bars missing")
    assert(colorCount(img, 255, 99, 132) > 10, "Deaths (red) bars missing")
    // the title band (top rows) carries drawn pixels
    var topOpaque = 0
    for (y <- 0 until 24; x <- 0 until img.getWidth)
      if ((img.getRGB(x, y) >>> 24) != 0) topOpaque += 1
    assert(topOpaque > 20, "title text missing from the top band")
  }

  test("multi-series trend renders every ranked series in its rotation color") {
    import spark.implicits._
    val longForm = Seq(
      ("A", java.sql.Date.valueOf("2020-05-01"), "May 01", 5L),
      ("A", java.sql.Date.valueOf("2020-05-02"), "May 02", 6L),
      ("B", java.sql.Date.valueOf("2020-05-01"), "May 01", 50L),
      ("B", java.sql.Date.valueOf("2020-05-02"), "May 02", 60L))
      .toDF("series", "day", "label", "value")
    val json = graft.serve.ChartPipeline
      .multiSeries(longForm, "top5statestrend").collect().head.getString(1)
    val img = decode(ChartPng.render(json))
    // rank 1 = B takes Red, rank 2 = A takes Yellow (TrendColors order)
    assert(colorCount(img, 255, 99, 132) > 100, "rank-1 series (red) missing")
    assert(colorCount(img, 255, 205, 86) > 100, "rank-2 series (yellow) missing")
  }

  test("renderCharts is a distributed per-row map emitting one decodable PNG per request") {
    import spark.implicits._
    val daily = Seq(
      (java.sql.Date.valueOf("2020-05-01"), "May 01", 10L),
      (java.sql.Date.valueOf("2020-05-02"), "May 02", 12L))
      .toDF("day", "label", "value")
    val reqs = graft.serve.ChartPipeline
      .singleSeries(daily, "chart-a", "A")
      .unionByName(graft.serve.ChartPipeline
        .singleSeries(daily.withColumn("value", col("value") + 5), "chart-b", "B"))
    val out = ChartPng.renderCharts(reqs, "key", "value")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("png")).toMap
    assert(out.keySet == Set("chart-a", "chart-b"))
    out.values.foreach { png =>
      val img = decode(png)
      assert(img.getWidth == 750 && img.getHeight == 450)
    }
    assert(out("chart-a").toSeq != out("chart-b").toSeq)
  }

  test("stacked horizontalBar: per-label composite bars, dataset segments in order") {
    import spark.implicits._
    // one dominant state: its Active (grey) segment must extend far
    // right, and since segments STACK, the blue segment starts after
    // the grey one on the same row — blue pixels must appear to the
    // right of where a non-stacked layout would start them
    val deltas = Seq(("Kerala", 1000L, 400L, 50L))
      .toDF("state", "deltaConfirmed", "deltaRecovered", "deltaDeaths")
    val json = graft.serve.ChartPipeline
      .barChart(deltas, "today", "May 01").collect().head.getString(1)
    val img = decode(ChartPng.render(json))
    // active = 550, recovered = 400, deaths = 50 → total 1000 spans the
    // full plot width; the grey segment alone is 55% of it
    val grey = colorCount(img, 201, 203, 207)
    val blue = colorCount(img, 54, 162, 235)
    val red = colorCount(img, 255, 99, 132)
    assert(grey > blue && blue > red && red > 0,
      s"segment sizes must follow values: grey=$grey blue=$blue red=$red")
    // stacking: all three colors share the SAME row band (one composite
    // bar), so there exists a y with both grey and blue pixels
    val rows = (0 until img.getHeight).filter { y =>
      (0 until img.getWidth).exists { x =>
        val p = img.getRGB(x, y); (p >>> 24) != 0 &&
          ((p >> 16) & 0xff) == 201 && ((p >> 8) & 0xff) == 203
      }
    }
    assert(rows.exists { y =>
      (0 until img.getWidth).exists { x =>
        val p = img.getRGB(x, y); (p >>> 24) != 0 &&
          ((p >> 16) & 0xff) == 54 && ((p >> 8) & 0xff) == 162
      }
    }, "blue segment does not share a row with grey — bars not stacked")
  }

  test("dual-axis testing trend: right-axis line scales independently of the stacked bars") {
    import spark.implicits._
    val daily = Seq(
      (java.sql.Date.valueOf("2020-05-01"), "May 01", 1000L, 50L),
      (java.sql.Date.valueOf("2020-05-02"), "May 02", 2000L, 80L),
      (java.sql.Date.valueOf("2020-05-03"), "May 03", 1500L, 60L),
      (java.sql.Date.valueOf("2020-05-04"), "May 04", 1800L, 90L),
      (java.sql.Date.valueOf("2020-05-05"), "May 05", 2200L, 70L))
      .toDF("day", "label", "tested", "positive")
    val json = graft.serve.ChartPipeline
      .testingTrendChart(daily, "testingtrend").collect().head.getString(1)
    val img = decode(ChartPng.render(json))
    // bars: Positive (red) + Tested (green) stacked on the left axis
    assert(colorCount(img, 255, 99, 132) > 30, "Positive bars missing")
    assert(colorCount(img, 75, 192, 192) > 100, "Tested bars missing")
    // the 5-day moving positivity line (blue) rides the RIGHT axis:
    // its values are ~3-5% — against the left axis (max 2280) it would
    // be flat on the x-axis; right-axis scaling must lift it well into
    // the plot. Blue pixels must exist ABOVE the bottom 20% band.
    val blueHigh = (0 until (img.getHeight * 3) / 4).map { y =>
      (0 until img.getWidth).count { x =>
        val p = img.getRGB(x, y); (p >>> 24) != 0 &&
          ((p >> 16) & 0xff) == 54 && ((p >> 8) & 0xff) == 162 && (p & 0xff) == 235
      }
    }.sum
    assert(blueHigh > 50,
      "right-axis line is flat on the x-axis — dual-axis scaling missing")
  }

  test("color parsing: Chart.js rgb strings, hex forms, unknown falls back to grey") {
    import java.awt.Color
    assert(ChartPng.parseColor("rgb(54, 162, 235)") == new Color(54, 162, 235))
    assert(ChartPng.parseColor("rgb(255,99,132)") == new Color(255, 99, 132))
    assert(ChartPng.parseColor("#ccc") == new Color(204, 204, 204))
    assert(ChartPng.parseColor("#1a2b3c") == new Color(26, 43, 60))
    assert(ChartPng.parseColor("nonsense") == new Color(201, 203, 207))
  }

  test("golden pixels: fixed request renders the pinned text-free-region CRC") {
    // r10 verdict task 7: dimensions/colors-present/segment-order gates
    // would all PASS through a JDK font or antialiasing change that
    // silently alters every served PNG. This pins the exact rasterized
    // pixels of the PLOT INTERIOR — a region with geometry only (bars +
    // line strokes, AA off): text renders outside it (y ticks at x=2,
    // x labels below y=133, no title), so the CRC is font-independent
    // and any geometry-rasterization change fails loudly. Golden values
    // regenerate by printing crc/blue/red over the same region.
    val json =
      """{"width":"200","height":"160","chart":{"type":"line","data":""" +
        """{"labels":["a","b","c","d"],"datasets":""" +
        """[{"label":"s1","borderColor":"rgb(54, 162, 235)","data":[0,5,3,8]},""" +
        """{"type":"bar","label":"s2","borderColor":"rgb(255, 99, 132)","data":[2,4,1,6]}]}}}"""
    val img = decode(ChartPng.render(json))
    // plot interior for a 200x160 no-title no-right-axis chart:
    // left=46, top=12, bottom=26 → strictly inside the axis lines
    val (rx0, ry0, rx1, ry1) = (47, 13, 187, 132)
    val crc = new java.util.zip.CRC32
    var blue = 0; var red = 0; var opaque = 0
    for (y <- ry0 to ry1; x <- rx0 to rx1) {
      val p = img.getRGB(x, y)
      crc.update(p >>> 24); crc.update((p >> 16) & 0xff)
      crc.update((p >> 8) & 0xff); crc.update(p & 0xff)
      if ((p >>> 24) != 0) {
        opaque += 1
        if (((p >> 16) & 0xff) == 54 && ((p >> 8) & 0xff) == 162 && (p & 0xff) == 235) blue += 1
        if (((p >> 16) & 0xff) == 255 && ((p >> 8) & 0xff) == 99 && (p & 0xff) == 132) red += 1
      }
    }
    assert(crc.getValue == 56017592L,
      s"plot-region pixels changed: crc=${crc.getValue} blue=$blue red=$red opaque=$opaque")
    // per-band histogram: the line's stroke pixels, the bars' fill
    // pixels, and NOTHING else in the region (blue+red == opaque means
    // no stray color — axis grey and text stay outside)
    assert(blue == 641 && red == 1030, s"per-series pixel counts moved: blue=$blue red=$red")
    assert(opaque == blue + red, s"foreign pixels entered the plot region: ${opaque - blue - red}")
  }
}
