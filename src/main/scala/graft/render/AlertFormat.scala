package graft.render

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.{DistrictwiseData, StatewiseDelta, StatewiseTestData}

/** Golden-compatible alert rendering (bot/BotUtils.java:160-343,
  * district/DistrictAlertUtils.java:12-55) — byte-identical to the
  * reference's output, proven by the mirrored AlertTextTests goldens.
  * Rendering is a serving-edge concern: the row-level functions run
  * driver-side on collected query results; `deltaAlertLineCol` is the
  * distributed Column form for rendering inside a plan at scale.
  */
object AlertFormat {

  private def positivityFormatter = new java.text.DecimalFormat("0.00")

  private def plural(n: Long, one: String, many: String): String =
    if (n == 1L) one else many

  /** "15 new cases, 4 deaths in Delhi\n"; empty for Total / all-zero
    * (BotUtils.java:250-284). */
  def deltaAlertLine(d: StatewiseDelta): String =
    if (d.state.equalsIgnoreCase("total")) ""
    else {
      val parts = Seq(
        Option.when(d.deltaConfirmed > 0L)(
          s"${d.deltaConfirmed} new ${plural(d.deltaConfirmed, "case", "cases")}"),
        Option.when(d.deltaDeaths > 0L)(
          s"${d.deltaDeaths} ${plural(d.deltaDeaths, "death", "deaths")}"),
        Option.when(d.deltaRecovered > 0L)(
          s"${d.deltaRecovered} ${plural(d.deltaRecovered, "recovery", "recoveries")}")
      ).flatten
      if (parts.isEmpty) "" else parts.mkString(", ") + s" in ${d.state}\n"
    }

  /** District variant, keyed by district name and string-typed numerics
    * (DistrictAlertUtils.java:25-55). */
  def districtDeltaAlertLine(d: DistrictwiseData): String = {
    val dc = d.deltaConfirmed.toLong
    val dd = d.deltaDeceased.toLong
    val dr = d.deltaRecovered.toLong
    val parts = Seq(
      Option.when(dc > 0L)(s"${d.deltaConfirmed} new ${plural(dc, "case", "cases")}"),
      Option.when(dd > 0L)(s"${d.deltaDeceased} ${plural(dd, "death", "deaths")}"),
      Option.when(dr > 0L)(s"${d.deltaRecovered} ${plural(dr, "recovery", "recoveries")}")
    ).flatten
    if (parts.isEmpty) "" else parts.mkString(", ") + s" in ${d.district}\n"
  }

  /** Per-state summary block (BotUtils.java:193-216). */
  def summaryBlock(delta: StatewiseDelta, daily: StatewiseDelta,
      doublingRate: String): String =
    s"\n<b>${delta.state}</b>\n<pre>\n" +
      s"Total cases  : (↑${daily.deltaConfirmed}) ${delta.currentConfirmed}\n" +
      s"Active       : (↑${daily.deltaConfirmed - daily.deltaRecovered - daily.deltaDeaths}) " +
      s"${delta.currentConfirmed - delta.currentRecovered - delta.currentDeaths}\n" +
      s"Recovered    : (↑${daily.deltaRecovered}) ${delta.currentRecovered}\n" +
      s"Deaths       : (↑${daily.deltaDeaths}) ${delta.currentDeaths}\n" +
      s"Doubling rate: $doublingRate days\n</pre>"

  /** Testing-data block incl. positivity rate = 100·positive/tested
    * rendered DecimalFormat("0.00") (BotUtils.java:218-247). */
  def testingBlock(t: StatewiseTestData): String = {
    val positivity =
      if (t.positive.isEmpty || t.totaltested.isEmpty) "0"
      else positivityFormatter.format(100.0 * t.positive.toLong / t.totaltested.toLong)
    "\n<pre>" +
      s"Total tested   : (↑${if (t.testreportedtoday.isEmpty) "?" else t.testreportedtoday}) ${t.totaltested}\n" +
      s"Positive       : (↑${if (t.positivereportedtoday.isEmpty) "?" else t.positivereportedtoday}) ${t.positive}\n" +
      s"Negative       : ${if (t.negative == null) "N/A" else t.negative}\n" +
      s"Unconfirmed    : ${if (t.unconfirmed == null) "N/A" else t.unconfirmed}\n" +
      s"Positivity rate: $positivity%\n" +
      s"Last updated   : ${t.updatedon}\n" +
      "</pre>\n"
  }

  /** Full summary = block + optional testing block, per state pair
    * (BotUtils.java:190-239 zip of deltas × dailies). */
  def summaryAlert(delta: StatewiseDelta, daily: StatewiseDelta,
      doublingRate: String, testing: Option[StatewiseTestData]): String =
    summaryBlock(delta, daily, doublingRate) +
      testing.map(testingBlock).getOrElse("")

  /** Full statewise alert assembly (BotUtils.java:157-188): delta lines,
    * optional district breakup, then the positionally-zipped (J4)
    * summary blocks; empty when nothing moved. */
  def statewiseAlertText(
      lastUpdated: String,
      deltas: Seq[StatewiseDelta],
      dailies: Seq[StatewiseDelta],
      testing: Map[String, StatewiseTestData],
      doublingRates: Map[String, String],
      districtDeltas: Seq[DistrictwiseData]): String = {
    val relevantDistricts = districtDeltas.exists(d =>
      d.deltaConfirmed.toLong > 0L || d.deltaRecovered.toLong > 0L ||
        d.deltaDeceased.toLong > 0L)
    val body = deltas.map(deltaAlertLine).mkString +
      (if (relevantDistricts) "\n<b>District-wise breakup</b>\n" else "") +
      districtDeltas.map(districtDeltaAlertLine).mkString
    if (body.isEmpty || body == "\n") ""
    else {
      val blocks = deltas.zip(dailies).map { case (delta, daily) =>
        summaryAlert(delta, daily,
          doublingRates.getOrElse(delta.state, "null"),
          testing.get(delta.state))
      }.mkString
      s"<i>$lastUpdated</i>\n\n$body$blocks"
    }
  }

  /** Zone → emoji mapping (BotUtils.java:387-403). */
  def zoneSmiley(zone: String): String = zone.toUpperCase match {
    case "GREEN"  => "💚"
    case "RED"    => "🔴"
    case "ORANGE" => "🔶"
    case _        => "❓"
  }

  /** District zone listing (BotUtils.java:379-385). The reference
    * iterates a HashMap (arbitrary order); we take caller-ordered rows. */
  def districtZoneText(state: String, districtZones: Seq[(String, String)]): String =
    s"<b>Districts of $state</b>\n\n" +
      districtZones.map { case (d, z) => s"${zoneSmiley(z)}   $d\n" }.mkString +
      "\nhttps://twitter.com/pib_india/status/1256468081896878080"

  /** `d/MM/yyyy HH:mm:ss` → "MMMM dd, hh:mm a" (Utils.java:30-38;
    * single-digit-day lenient). Locale pinned for determinism. */
  def friendlyTime(lastUpdated: String): String =
    try {
      java.time.LocalDateTime
        .parse(lastUpdated, java.time.format.DateTimeFormatter
          .ofPattern("d/MM/yyyy HH:mm:ss", java.util.Locale.US))
        .format(java.time.format.DateTimeFormatter
          .ofPattern("MMMM dd, hh:mm a", java.util.Locale.US))
    } catch { case _: java.time.format.DateTimeParseException => null }

  /** State code abbreviations for the summary table (Utils.java:41-84). */
  val stateCodes: Map[String, String] = Map(
    "Total" -> "Total", "Andhra Pradesh" -> "AP", "Arunachal Pradesh" -> "AR",
    "Assam" -> "Assam", "Bihar" -> "Bihar", "Chhattisgarh" -> "CT",
    "Goa" -> "Goa", "Gujarat" -> "Guja", "Haryana" -> "HR",
    "Himachal Pradesh" -> "HP", "Jharkhand" -> "JH", "Karnataka" -> "KA",
    "Kerala" -> "Ker", "Madhya Pradesh" -> "MP", "Maharashtra" -> "Mah",
    "Manipur" -> "Mani", "Meghalaya" -> "Megh", "Mizoram" -> "Mizo",
    "Nagaland" -> "Naga", "Odisha" -> "Odis", "Punjab" -> "Punj",
    "Rajasthan" -> "Raj", "Sikkim" -> "Sikk", "Tamil Nadu" -> "TN",
    "Telangana" -> "Telg", "Tripura" -> "Trip", "Uttarakhand" -> "UT",
    "Uttar Pradesh" -> "UP", "West Bengal" -> "WB",
    "Andaman and Nicobar Islands" -> "A&N", "Chandigarh" -> "CH",
    "Dadra and Nagar Haveli" -> "DNH", "Daman and Diu" -> "DD",
    "Delhi" -> "Delhi", "Jammu and Kashmir" -> "J&K", "Ladakh" -> "LDK",
    "Lakshadweep" -> "LDWP", "Puducherry" -> "Pudu",
    "State Unassigned" -> "Unass")

  /** Fixed-width state summary table (BotUtils.java:286-321): skip
    * zero rows, Total rendered last. `daily` picks delta vs current
    * columns. Byte-identical to the reference INCLUDING the edge case:
    * `stateCodes.get(state)` on a state missing from the map (or a
    * default Total row with an empty state) formats Java's null as the
    * literal "null" (BotUtils.java:308,316). */
  def stateSummaryTable(sortedStats: Seq[StatewiseDelta], lastUpdated: String,
      daily: Boolean): String = {
    def row(s: StatewiseDelta): String = {
      val (c, r, d) =
        if (daily) (s.deltaConfirmed, s.deltaRecovered, s.deltaDeaths)
        else (s.currentConfirmed, s.currentRecovered, s.currentDeaths)
      f"${stateCodes.getOrElse(s.state, "null")}%-5s|$c%7s|$r%7s|$d%6s\n"
    }
    val total = sortedStats.find(_.state.equalsIgnoreCase("Total"))
      .getOrElse(StatewiseDelta())
    val body = sortedStats
      .filterNot(_.state.equalsIgnoreCase("Total"))
      .filterNot { s =>
        if (daily) s.deltaConfirmed == 0L && s.deltaRecovered == 0L && s.deltaDeaths == 0L
        else s.currentConfirmed < 1L && s.currentRecovered < 1L && s.currentDeaths < 1L
      }
      .map(row).mkString
    s"<i>${friendlyTime(lastUpdated)}</i>\n\n" +
      "Summary of all affected Indian States\n\n" +
      "<pre>\n" +
      "State|   Conf|   Rec.|  Died\n" +
      "----------------------------\n" +
      body +
      "----------------------------\n" +
      row(total) +
      "</pre>"
  }

  /** Distributed Column form of deltaAlertLine: render alert lines
    * inside the plan (no collect) for fanout at scale. `concat_ws`
    * skips NULL segments, which reproduces the reference's conditional
    * comma-joining exactly. */
  def deltaAlertLineCol(dc: Column, dd: Column, dr: Column, state: Column): Column = {
    def seg(n: Column, infix: String, one: String, many: String): Column =
      when(n > 0L, concat(n.cast("string"), lit(infix),
        when(n === 1L, one).otherwise(many)))
    val joined = concat_ws(", ",
      seg(dc, " new ", "case", "cases"),
      seg(dd, " ", "death", "deaths"),
      seg(dr, " ", "recovery", "recoveries"))
    when(lower(state) === "total" || joined === "", lit(""))
      .otherwise(concat(joined, lit(" in "), state, lit("\n")))
  }
}
