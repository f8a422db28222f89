package graft.serve

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.core.{UserLocation, UserPrefs, UserRequest}
import graft.ingest.Codecs

/** The bot's produce paths (SURVEY §2.1 S4 serving edge): user
  * preferences, user requests, and shared locations, each a typed
  * record JSON-encoded onto its topic with the key the reference uses
  * (UserPrefsProducer.java:33-52 / UserRequestProducer.java:28-47 /
  * UserLocationProducer.java + the send sites at
  * bot/Covid19Bot.java:122,134-164,215,251,503-525).
  *
  * Each helper returns the encoded (key, value) frame for the topic —
  * the engine-side half of the produce. Wiring to a broker is
  * `Codecs.toKafkaBatch(frames, servers, topic)`; in
  * connector-less environments the same frames drive
  * `Codecs.toFrameFiles` (executed round-trip in CodecsSpec).
  */
object Producers {

  /** `user-preferences` topic: keyed by userId (the bot keys by the
    * stringified Telegram user id). */
  def userPrefsFrames(prefs: Dataset[UserPrefs]): DataFrame =
    Codecs.encode(prefs, "userId")

  /** `user-request` topic: keyed by chatId. */
  def userRequestFrames(requests: Dataset[UserRequest]): DataFrame =
    Codecs.encode(requests, "chatId")

  /** `user-location` topic: keyed by chatId. The key is NOT a record
    * field in the reference (it rides the send call), so the value JSON
    * carries only latitude/longitude — the caller provides
    * (chatId, location) pairs. */
  def userLocationFrames(spark: SparkSession,
      locations: Seq[(String, UserLocation)]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_json}
    locations.toDF("chatId", "loc").select(
      col("chatId").cast("string").as("key"),
      to_json(col("loc")).as("value"))
  }
}
