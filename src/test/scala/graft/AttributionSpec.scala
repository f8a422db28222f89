package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.queries.AttributionQueries

/** Cross-model invariants of the attribution family (q216/q217/q218)
  * on sf0.001 — conservation laws the oracle's value-hash can't state
  * (every purchase credited once, floors lose < 1 unit per touch,
  * decay weights bounded by the window) — plus a driver-side pin of
  * the shift-based decay schedule.
  *
  * Results are COLLECTED once, never `.cache()`d: a cached plan on the
  * shared session would be picked up by PlanSpec's explain of the same
  * query (the InMemoryRelation embeds the child plan text and doubles
  * every node count a regex sees) — the exact cross-suite interference
  * the bench-hygiene fix exists to prevent.
  */
class AttributionSpec extends SparkSpec {

  private lazy val q216: Array[Row] =
    AttributionQueries.lastTouch.fn(spark, sf).collect()
  private lazy val q217: Array[Row] =
    AttributionQueries.linear.fn(spark, sf).collect()
  private lazy val q218: Array[Row] =
    AttributionQueries.timeDecay.fn(spark, sf).collect()

  test("last-touch: every purchase is credited exactly once") {
    val purchases = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    val credited = q216.map(_.getAs[Long]("n_conv")).sum
    assert(credited === purchases)
  }

  test("last-touch: shares partition the ppm space (floor slack < #channels)") {
    val shares = q216.map(_.getAs[Long]("share_ppm"))
    assert(shares.sum <= 1000000L)
    assert(shares.sum > 1000000L - shares.length)
  }

  test("linear: per-conversion credits sum to ~1e6 (floor slack < n_touches)") {
    // channel-level invariant: total credit <= 1e6 * converted purchases,
    // and > (1e6 - maxTouches) * converted  — the floor loses < 1 unit
    // per touch. Converted = purchases with >= 1 in-window touch.
    val convertedTotal = q217.map(_.getAs[Long]("credit_u6")).sum
    val nConverted = q216.filter(_.getAs[String]("channel") != "none")
      .map(_.getAs[Long]("n_conv")).sum
    assert(convertedTotal <= 1000000L * nConverted)
    val nTouches = q217.map(_.getAs[Long]("n_touches")).sum
    assert(convertedTotal > 1000000L * nConverted - nTouches)
  }

  test("time-decay: credit is bounded by linear touch count and positive") {
    // each touch's decayed weight is in (0, 1e6]: sum <= 1e6 * n_touches
    val credit = q218.map(_.getAs[Long]("decay_credit_u6")).sum
    val touches = q218.map(_.getAs[Long]("n_touches")).sum
    assert(credit > 0L && credit <= 1000000L * touches)
    // weights floor at 1e6 >> 6 = 15625 for 6-day-old touches: a
    // touch can never contribute 0 inside the 7-day window
    assert(credit >= 15625L * touches)
  }

  test("formula pin: the decay weight is an exact shift, not pow()") {
    // replicate one credit by hand: age 0 days -> 1e6; 1 -> 500000;
    // 6 -> 15625 — the same integers the SQL's (1<<d) form yields
    val expected = Seq(0, 1, 2, 3, 4, 5, 6).map(d => 1000000L >> d)
    assert(expected === Seq(1000000L, 500000L, 250000L, 125000L,
      62500L, 31250L, 15625L))
  }

  test("models agree on channel universe; only last-touch adds 'none'") {
    val chans217 = q217.map(_.getAs[String]("channel")).toSet
    val chans218 = q218.map(_.getAs[String]("channel")).toSet
    assert(chans217 === chans218)
    val chans216 = q216.map(_.getAs[String]("channel")).toSet
    assert((chans216 -- chans217) subsetOf Set("none"))
  }

  test("q263: Shapley efficiency axiom — credits sum to v(N) - v(empty), exactly") {
    val phi = AttributionQueries.shapley.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("phi6")).toMap
    assert(phi.keySet === Set("view", "click", "signup"))
    // rebuild v(N) and v(∅) from the query's own coalition definition
    val e = graft.sources.Tables.load(spark, sf, "events")
    val tch = e.filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("event_type").as("ch")).distinct()
    val cv = e.filter(col("event_type") === "purchase")
      .select("user_id").distinct().withColumn("conv", lit(1L))
    val co = e.select("user_id").distinct()
      .join(tch, Seq("user_id"), "left")
      .groupBy("user_id")
      .agg(concat_ws(",", sort_array(collect_set(col("ch")))).as("m"))
      .join(cv, Seq("user_id"), "left")
      .groupBy("m")
      .agg(expr("1000000L * sum(coalesce(conv, 0L)) div count(1)").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vN = co.getOrElse("click,signup,view", 0L)
    val vE = co.getOrElse("", 0L)
    // Σφ6 = n!·(v(N) − v(∅)) holds for ANY total v on the lattice —
    // including the v≡0 fill-in for unobserved coalitions
    assert(phi.values.sum === 6L * (vN - vE),
      s"efficiency broke: ${phi.values.sum} != 6*(${vN} - ${vE})")
  }
}
