package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core._

/** A1/A2 — the reference's running-delta KTable aggregate
  * (Covid19Stats.java:85-96,227-242): for every new snapshot per key,
  * delta = newTotal − previousTotal (zero-initialized), currents
  * overwritten, and an output row emitted for EVERY input (the
  * subtractor is a no-op, SURVEY.md §7.4.1).
  *
  * Spark-first form: typed `flatMapGroupsWithState` — per-key state is
  * one small record, partitioned by the grouping key, so it scales
  * linearly with key cardinality (no global state, no driver loop).
  * Works identically under Structured Streaming (micro-batch iterator
  * per key) and batch (one iterator per key).
  */
object DeltaTracker {

  private def parse(s: String): Long =
    if (s == null || s.isEmpty) 0L else s.toLong

  /** Statewise tracker (key = state). */
  def statewise(in: Dataset[StampedStats]): Dataset[StampedDelta] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.stats.state)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(trackState)
  }

  private def trackState(
      state: String,
      rows: Iterator[StampedStats],
      gs: GroupState[StatewiseDelta]): Iterator[StampedDelta] = {
    var agg = gs.getOption.getOrElse(StatewiseDelta())
    // within a micro-batch the iterator order is shuffle-arrival order;
    // sort by event time to process snapshots in stream order.
    val out = rows.toSeq.sortBy(_.eventTime.getTime).map { r =>
      agg = StatewiseDelta(
        deltaRecovered = parse(r.stats.recovered) - agg.currentRecovered,
        deltaDeaths = parse(r.stats.deaths) - agg.currentDeaths,
        deltaConfirmed = parse(r.stats.confirmed) - agg.currentConfirmed,
        currentRecovered = parse(r.stats.recovered),
        currentDeaths = parse(r.stats.deaths),
        currentConfirmed = parse(r.stats.confirmed),
        lastUpdatedTime = r.stats.lastupdatedtime,
        state = state)
      StampedDelta(r.eventTime, agg)
    }
    gs.update(agg)
    out.iterator
  }

  /** Districtwise tracker (composite key state+district,
    * Covid19Stats.java:100-111,211-225; init is the all-"0" record). */
  def districtwise(in: Dataset[StampedDistrict]): Dataset[StampedDistrict] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(r => StateAndDistrict(r.data.state, r.data.district))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(trackDistrict)
  }

  private def trackDistrict(
      key: StateAndDistrict,
      rows: Iterator[StampedDistrict],
      gs: GroupState[DistrictwiseData]): Iterator[StampedDistrict] = {
    var agg = gs.getOption.getOrElse(DistrictwiseData())
    val out = rows.toSeq.sortBy(_.eventTime.getTime).map { r =>
      agg = r.data.copy(
        deltaConfirmed = (parse(r.data.confirmed) - parse(agg.confirmed)).toString,
        deltaRecovered = (parse(r.data.recovered) - parse(agg.recovered)).toString,
        deltaDeceased = (parse(r.data.deceased) - parse(agg.deceased)).toString)
      StampedDistrict(r.eventTime, agg)
    }
    gs.update(agg)
    out.iterator
  }
}
