package graft.core

import java.sql.Timestamp

/** Domain model mirroring the reference's record types (SURVEY.md §1.2;
  * covid19-models/src/main/java/org/covid19/). The reference keeps
  * every numeric as String and parses ad hoc; we keep the string-typed
  * ingest shape (for serde fidelity) and normalize to Long inside the
  * operators (SURVEY.md §1.3).
  */

/** Input snapshot per state (StatewiseStats.java:14-21 — all String). */
final case class StatewiseStats(
    active: String,
    confirmed: String,
    deaths: String,
    recovered: String,
    state: String,
    statecode: String,
    lastupdatedtime: String)

/** Derived running delta (StatewiseDelta.java:12-20). */
final case class StatewiseDelta(
    deltaRecovered: Long = 0L,
    deltaDeaths: Long = 0L,
    deltaConfirmed: Long = 0L,
    currentRecovered: Long = 0L,
    currentDeaths: Long = 0L,
    currentConfirmed: Long = 0L,
    lastUpdatedTime: String = "",
    state: String = "")

/** District input/derived record (district/DistrictwiseData.java:12-22). */
final case class DistrictwiseData(
    state: String = "",
    district: String = "",
    confirmed: String = "0",
    active: String = "0",
    recovered: String = "0",
    deceased: String = "0",
    deltaConfirmed: String = "0",
    deltaRecovered: String = "0",
    deltaDeceased: String = "0",
    notes: String = "")

/** Composite keys (StateAndDistrict.java, StateAndDate.java). */
final case class StateAndDistrict(state: String, district: String)
final case class StateAndDate(date: String, state: String)

/** Patient record — the fields the analyzer touches
  * (PatientInfo.java:10-29; unused fields omitted, lenient like the
  * reference's Gson decoding). */
final case class PatientInfo(
    patientnumber: String = "",
    dateannounced: String = "",
    detectedcity: String = "",
    detecteddistrict: String = "",
    detectedstate: String = "",
    currentstatus: String = "",
    source1: String = "",
    source2: String = "",
    source3: String = "")

/** User subscription prefs (UserPrefs.java:14-23 — `subscribed` flag
  * instead of tombstones). */
final case class UserPrefs(userId: String, myStates: Seq[String], subscribed: Boolean)

/** Testing metrics per state — the fields the alert renderer touches
  * (StatewiseTestData.java:14-33, all String). */
final case class StatewiseTestData(
    negative: String = "",
    positive: String = "",
    totaltested: String = "",
    unconfirmed: String = "",
    updatedon: String = "",
    testreportedtoday: String = "",
    positivereportedtoday: String = "",
    state: String = "")

/** A serving request produced by the bot edge
  * (UserRequest.java: chatId + requested view, keyed by chatId —
  * bot/Covid19Bot.java:134-164). */
final case class UserRequest(chatId: String, state: String)

/** A shared-location record produced by the bot edge
  * (location/UserLocation.java, keyed by chatId —
  * bot/Covid19Bot.java:122). */
final case class UserLocation(latitude: String, longitude: String)

/** Event-time-stamped wrappers for the streaming topologies (the Kafka
  * record timestamp in the reference, ST1). */
final case class StampedStats(eventTime: Timestamp, stats: StatewiseStats)
final case class StampedDistrict(eventTime: Timestamp, data: DistrictwiseData)
final case class StampedDelta(eventTime: Timestamp, delta: StatewiseDelta)
final case class StampedPatient(eventTime: Timestamp, patient: PatientInfo)
