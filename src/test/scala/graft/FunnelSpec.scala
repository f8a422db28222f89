package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{FunnelTracker, UserEvent}

/** FunnelTracker: batch-stream duality with q185 (the ordered-step
  * reachability query), prefix-split invariance, and the no-re-arm
  * timeout rule.
  */
class FunnelSpec extends SparkSpec {

  private def events = graft.sources.Tables.load(spark, sf, "events")

  private def asUserEvents = {
    import spark.implicits._
    events.select(col("user_id").as("userId"),
      col("event_type").as("eventType"),
      unix_micros(col("ts")).as("tsUs")).as[UserEvent]
  }

  test("batch form equals q185's funnel count on the real events table") {
    import spark.implicits._
    val conversions = FunnelTracker.track(asUserEvents).collect()
    val q185 = graft.queries.Registry.byName("q185_event_funnel")
      .fn(spark, sf).head()
    assert(conversions.length.toLong ===
      q185.getAs[Long]("n_view_click_purchase"))
    // the reached timestamps ARE the mins the SQL selects: re-derive
    // t1/t2/t3 relationally and compare per user
    val v = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t1"))
    val c = events.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(unix_micros(col("ts")) > col("t1") &&
        unix_micros(col("ts")) <= col("t1") + lit(FunnelTracker.StepTimeoutUs))
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t2"),
        first(col("t1")).as("t1b"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(unix_micros(col("ts")) > col("t2") &&
        unix_micros(col("ts")) <= col("t2") + lit(FunnelTracker.StepTimeoutUs))
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t3"),
        first(col("t1b")).as("t1"), first(col("t2")).as("t2"))
    val expected = p.select("user_id", "t1", "t2", "t3")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(conversions.map(f => (f.userId, f.t1Us, f.t2Us, f.t3Us)).toSet
      === expected)
    assert(conversions.nonEmpty, "no conversions at this sf — vacuous")
  }

  test("streaming prefix splits converge to the batch answer; no duplicate emission") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val all = asUserEvents.collect().sortBy(_.tsUs)
    val batchAnswer = FunnelTracker.track(asUserEvents).collect()
      .map(f => (f.userId, f.t1Us, f.t2Us, f.t3Us)).toSet
    val (a, b) = all.splitAt(all.length / 2)
    val ms = MemoryStream[UserEvent]
    val q = FunnelTracker.track(ms.toDS())
      .writeStream.format("memory").queryName("funnel_t")
      .outputMode("append").start()
    try {
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
      val got = spark.table("funnel_t")
        .as[graft.streaming.FunnelConversion].collect()
      assert(got.map(f => (f.userId, f.t1Us, f.t2Us, f.t3Us)).toSet
        === batchAnswer)
      assert(got.length === got.map(_.userId).distinct.length,
        "a user converted twice across micro-batches")
    } finally q.stop()
  }

  test("a step outside its window never re-arms (q185's first-view semantics)") {
    import spark.implicits._
    val week = FunnelTracker.StepTimeoutUs
    val evs = Seq(
      UserEvent(1L, "view", 0L),
      UserEvent(1L, "click", week + 1L), // outside the view's window
      UserEvent(1L, "view", week + 2L), // later view must NOT re-open
      UserEvent(1L, "click", week + 3L), // would qualify off the 2nd view
      UserEvent(1L, "purchase", week + 4L),
      UserEvent(2L, "view", 0L), // control: clean conversion
      UserEvent(2L, "click", 10L),
      UserEvent(2L, "purchase", 20L)).toDS()
    val got = FunnelTracker.track(evs).collect()
    assert(got.map(_.userId).toSeq === Seq(2L))
    assert(got.head.t3Us === 20L)
  }
}
