package graft.serve

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.UserPrefs
import graft.render.AlertFormat

/** The bot's alert fanout (S5/P6/P12/J2 — StatsAlertConsumerConfig.java:
  * 89-189, bot KafkaStreamsConfig.java:164-188): for each delta, find
  * subscribed users whose preferred states contain the delta's state and
  * render their alert line.
  *
  * Reference shape: per-alert full scan of the prefs store inside a
  * consumer loop + 5 s ordering sleep (ST6). Spark-first shape: ONE
  * declarative plan per micro-batch — prefs exploded to (state → user)
  * and equi-joined (broadcast; prefs are user-count-sized), rendering as
  * a Column. The daily/delta consistency problem the sleep "solved"
  * disappears: both views are computed in the same micro-batch.
  */
object AlertPipeline {

  /** P12 — only deltas with any movement alert. */
  def relevant(deltas: DataFrame): DataFrame =
    deltas.filter(col("deltaConfirmed") >= 1L || col("deltaRecovered") >= 1L ||
      col("deltaDeaths") >= 1L)

  /** J2 as explode + equi-join (scales with |prefs|·avg-states, not
    * |alerts|×|users| as the reference's crossJoin-equivalent scan). */
  def fanout(deltas: DataFrame, prefs: Dataset[UserPrefs]): DataFrame = {
    val subscriptions = prefs.toDF()
      .filter(col("subscribed"))
      .select(col("userId"), explode(col("myStates")).as("state"))
    relevant(deltas)
      .join(broadcast(subscriptions), Seq("state"))
      .select(col("userId"), col("state"),
        AlertFormat.deltaAlertLineCol(
          col("deltaConfirmed"), col("deltaDeaths"), col("deltaRecovered"),
          col("state")).as("alertText"))
      .filter(col("alertText") =!= "")
  }

  /** Streaming entry: one foreachBatch per micro-batch; `send` is the
    * side-effecting sink boundary (Telegram adapter in the reference —
    * out of engine scope, injected for testability). */
  def run(deltaStream: DataFrame, prefs: Dataset[UserPrefs],
      send: (String, String) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    deltaStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        fanout(batch, prefs).collect().foreach { r =>
          send(r.getAs[String]("userId"), r.getAs[String]("alertText"))
        }
      }
      .start()
}
