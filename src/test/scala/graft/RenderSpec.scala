package graft

import org.apache.spark.sql.functions.col

import graft.core.{DistrictwiseData, StatewiseDelta, StatewiseTestData}
import graft.render.AlertFormat

/** Byte-identical goldens mirrored from the reference's own test suite
  * (AlertTextTests.java, DistrictAlertUtilsTest.java — FIXTURES.md). */
class RenderSpec extends SparkSpec {

  private def delta(dr: Long, dd: Long, dc: Long, cr: Long = 0, cd: Long = 0,
      cc: Long = 0, state: String): StatewiseDelta =
    StatewiseDelta(dr, dd, dc, cr, cd, cc, "", state)

  test("delta alert lines (AlertTextTests:23-64 goldens)") {
    assert(AlertFormat.deltaAlertLine(delta(0, 0, 1, state = "Delhi"))
      == "1 new case in Delhi\n")
    assert(AlertFormat.deltaAlertLine(delta(0, 0, 10, state = "Delhi"))
      == "10 new cases in Delhi\n")
    assert(AlertFormat.deltaAlertLine(delta(9, 0, 15, state = "Maharashtra"))
      == "15 new cases, 9 recoveries in Maharashtra\n")
    assert(AlertFormat.deltaAlertLine(delta(0, 4, 15, state = "Delhi"))
      == "15 new cases, 4 deaths in Delhi\n")
    assert(AlertFormat.deltaAlertLine(delta(9, 3, 0, state = "Delhi"))
      == "3 deaths, 9 recoveries in Delhi\n")
    assert(AlertFormat.deltaAlertLine(delta(9, 3, 5, state = "Total")) == "")
    assert(AlertFormat.deltaAlertLine(delta(0, 0, 0, state = "Delhi")) == "")
  }

  test("summary block (AlertTextTests:66-85 golden)") {
    val golden = "\n<b>Total</b>\n<pre>\n" +
      "Total cases  : (↑15) 5341\n" +
      "Active       : (↑2) 4729\n" +
      "Recovered    : (↑9) 455\n" +
      "Deaths       : (↑4) 157\n" +
      "Doubling rate: 250 days\n</pre>"
    val d = StatewiseDelta(9L, 4L, 15L, 455L, 157L, 5341L, "", "Total")
    val daily = StatewiseDelta(9L, 4L, 15L, 0L, 0L, 0L, "", "Total")
    assert(AlertFormat.summaryBlock(d, daily, "250") == golden)
  }

  test("summary block with testing data (AlertTextTests:87-116 golden, positivity 3.05%)") {
    val golden = "\n<b>Delhi</b>\n<pre>\n" +
      "Total cases  : (↑15) 5341\n" +
      "Active       : (↑2) 4729\n" +
      "Recovered    : (↑9) 455\n" +
      "Deaths       : (↑4) 157\n" +
      "Doubling rate: 250 days\n</pre>" +
      "\n<pre>" +
      "Total tested   : (↑19462) 53166\n" +
      "Positive       : (↑38) 1621\n" +
      "Negative       : 51161\n" +
      "Unconfirmed    : 384\n" +
      "Positivity rate: 3.05%\n" +
      "Last updated   : 26/04/2020\n" +
      "</pre>\n"
    val d = StatewiseDelta(9L, 4L, 15L, 455L, 157L, 5341L, "", "Delhi")
    val daily = StatewiseDelta(9L, 4L, 15L, 0L, 0L, 0L, "", "Delhi")
    val t = StatewiseTestData(negative = "51161", positive = "1621",
      totaltested = "53166", unconfirmed = "384", updatedon = "26/04/2020",
      testreportedtoday = "19462", positivereportedtoday = "38", state = "Delhi")
    assert(AlertFormat.summaryAlert(d, daily, "250", Some(t)) == golden)
  }

  test("district alert line (DistrictAlertUtilsTest golden)") {
    val d = DistrictwiseData("Maharashtra", "Mumbai", "120", "90", "5", "9",
      "12", "3", "1", "")
    assert(AlertFormat.districtDeltaAlertLine(d)
      == "12 new cases, 1 death, 3 recoveries in Mumbai\n")
  }

  test("final multi-state alert (AlertTextTests:155-208 golden)") {
    val golden = "<i>April 08, 12:04 AM</i>\n\n" +
      "1 new case in Assam\n" +
      "9 new cases in Himachal Pradesh\n" +
      "\n<b>Assam</b>\n<pre>\n" +
      "Total cases  : (↑1) 28\nActive       : (↑1) 28\n" +
      "Recovered    : (↑0) 0\nDeaths       : (↑0) 0\n" +
      "Doubling rate: 19.44 days\n</pre>" +
      "\n<b>Himachal Pradesh</b>\n<pre>\n" +
      "Total cases  : (↑9) 27\nActive       : (↑9) 24\n" +
      "Recovered    : (↑0) 1\nDeaths       : (↑0) 2\n" +
      "Doubling rate: 2.10 days\n</pre>" +
      "\n<b>Total</b>\n<pre>\n" +
      "Total cases  : (↑31) 5341\nActive       : (↑20) 4729\n" +
      "Recovered    : (↑8) 455\nDeaths       : (↑3) 157\n" +
      "Doubling rate: 116 days\n</pre>"
    val dailies = Seq(
      StatewiseDelta(0, 0, 1, 0, 0, 0, "08/04/2020 23:41:35", "Assam"),
      StatewiseDelta(0, 0, 9, 0, 0, 0, "08/04/2020 00:04:28", "Himachal Pradesh"),
      StatewiseDelta(8, 3, 31, 0, 0, 0, "08/04/2020 00:04:28", "Total"))
    val deltas = Seq(
      StatewiseDelta(0, 0, 1, 0, 0, 28, "08/04/2020 23:41:35", "Assam"),
      StatewiseDelta(0, 0, 9, 1, 2, 27, "08/04/2020 00:04:28", "Himachal Pradesh"),
      StatewiseDelta(0, 0, 9, 455, 157, 5341, "08/04/2020 00:04:28", "Total"))
    val rates = Map("Assam" -> "19.44", "Himachal Pradesh" -> "2.10", "Total" -> "116")
    val got = AlertFormat.statewiseAlertText("April 08, 12:04 AM",
      deltas, dailies, Map.empty, rates, Seq.empty)
    assert(got == golden)
  }

  test("statewise alert with district breakup (AlertTextTests:210-253 golden)") {
    val golden = "<i>April 08, 12:04 AM</i>\n\n" +
      "1 new case in Maharashtra\n\n" +
      "<b>District-wise breakup</b>\n" +
      "1 new case in Mumbai\n" +
      "\n<b>Total</b>\n<pre>\n" +
      "Total cases  : (↑31) 5341\nActive       : (↑20) 4729\n" +
      "Recovered    : (↑8) 455\nDeaths       : (↑3) 157\n" +
      "Doubling rate: 116 days\n</pre>" +
      "\n<b>Maharashtra</b>\n<pre>\n" +
      "Total cases  : (↑1) 28\nActive       : (↑1) 28\n" +
      "Recovered    : (↑0) 0\nDeaths       : (↑0) 0\n" +
      "Doubling rate: 19.44 days\n</pre>"
    val dailies = Seq(
      StatewiseDelta(8, 3, 31, 0, 0, 0, "08/04/2020 00:04:28", "Total"),
      StatewiseDelta(0, 0, 1, 0, 0, 0, "08/04/2020 23:41:35", "Maharashtra"))
    val deltas = Seq(
      StatewiseDelta(0, 0, 9, 455, 157, 5341, "08/04/2020 00:04:28", "Total"),
      StatewiseDelta(0, 0, 1, 0, 0, 28, "08/04/2020 23:41:35", "Maharashtra"))
    val districts = Seq(
      DistrictwiseData("Maharashtra", "Mumbai", "28", "28", "0", "0", "1", "0", "0", ""),
      DistrictwiseData("Maharashtra", "Nagpur", "17", "13", "0", "2", "0", "0", "0", ""))
    val got = AlertFormat.statewiseAlertText("April 08, 12:04 AM",
      deltas, dailies, Map.empty,
      Map("Total" -> "116", "Maharashtra" -> "19.44"), districts)
    assert(got == golden)
  }

  test("district zone text (BotUtilsTest golden, caller-ordered)") {
    val golden = "<b>Districts of Maharashtra</b>\n\n" +
      "❓   Chandrapur\n" +
      "🔴   Nagpur\n" +
      "🔶   Pune\n" +
      "💚   Mumbai\n" +
      "\nhttps://twitter.com/pib_india/status/1256468081896878080"
    val got = AlertFormat.districtZoneText("Maharashtra", Seq(
      "Chandrapur" -> "Unknown", "Nagpur" -> "Red",
      "Pune" -> "Orange", "Mumbai" -> "Green"))
    assert(got == golden)
  }

  test("friendlyTime parses single- and double-digit days (BotUtilsTest golden)") {
    assert(AlertFormat.friendlyTime("05/12/2020 00:15:03") == "December 05, 12:15 AM")
    assert(AlertFormat.friendlyTime("5/12/2020 00:15:03") == "December 05, 12:15 AM")
    assert(AlertFormat.friendlyTime("garbage") == null)
  }

  test("state summary table: fixed columns, zero rows skipped, Total last") {
    val stats = Seq(
      StatewiseDelta(9, 4, 15, 455, 157, 5341, "", "Total"),
      StatewiseDelta(0, 0, 0, 100, 5, 300, "", "Kerala"),
      StatewiseDelta(0, 0, 0, 7, 1, 20, "", "Atlantis"), // not in stateCodes
      StatewiseDelta(0, 0, 0, 0, 0, 0, "", "Goa")) // all-zero: skipped
    val got = AlertFormat.stateSummaryTable(stats, "05/12/2020 00:15:03", daily = false)
    assert(got.contains("<i>December 05, 12:15 AM</i>"))
    assert(got.contains("State|   Conf|   Rec.|  Died\n"))
    assert(got.contains("Ker  |    300|    100|     5\n"))
    // reference renders HashMap.get(unknown)=null as the literal "null"
    // (BotUtils.java:308) — byte-identical includes this edge
    assert(got.contains("null |     20|      7|     1\n"))
    assert(!got.contains("Goa  |"))
    val lines = got.split("\n")
    assert(lines(lines.length - 2) == "Total|   5341|    455|   157")
  }

  test("distributed Column renderer matches the driver-side renderer") {
    import spark.implicits._
    val cases = Seq(
      (0L, 0L, 1L, "Delhi"), (0L, 0L, 10L, "Delhi"),
      (9L, 0L, 15L, "Maharashtra"), (0L, 4L, 15L, "Delhi"),
      (9L, 3L, 0L, "Delhi"), (9L, 3L, 5L, "Total"), (0L, 0L, 0L, "Delhi"))
    val df = cases.toDF("dr", "dd", "dc", "state")
    val got = df.select(AlertFormat.deltaAlertLineCol(
      col("dc"), col("dd"), col("dr"), col("state")).as("line"))
      .as[String].collect().toSeq
    val exp = cases.map { case (dr, dd, dc, st) =>
      AlertFormat.deltaAlertLine(StatewiseDelta(dr, dd, dc, 0, 0, 0, "", st))
    }
    assert(got == exp)
  }
}
