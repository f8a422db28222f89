package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{DailyCount, EwmaTracker}

/** EwmaTracker: batch-stream duality with q141's integer EWMA trend,
  * prefix-split invariance, and the exact-recurrence pin. */
class EwmaSpec extends SparkSpec {

  private def dailyCounts = {
    import spark.implicits._
    graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("event_type").as("key"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .as("day"))
      .agg(count(lit(1)).as("n"))
      .as[DailyCount]
  }

  private def q141Expected: Set[(String, Int, Long, Long)] =
    graft.queries.Registry.byName("q141_ewma_trend").fn(spark, sf)
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01").cast("date")).as("day"),
        col("n"), col("ewma_milli"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("batch form is bit-identical to q141's registered EWMA output") {
    val got = EwmaTracker.track(dailyCounts).collect()
      .map(p => (p.key, p.day, p.n, p.ewmaMilli)).toSet
    val expected = q141Expected
    assert(got === expected)
    assert(got.nonEmpty, "no daily counts at this sf — vacuous")
  }

  test("streaming prefix splits converge to the batch answer; one point per day") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val all = dailyCounts.collect().sortBy(r => (r.day, r.key))
    val (a, b) = all.splitAt(all.length / 3) // uneven split on purpose
    val ms = MemoryStream[DailyCount]
    val q = EwmaTracker.track(ms.toDS())
      .writeStream.format("memory").queryName("ewma_t")
      .outputMode("append").start()
    try {
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
      val got = spark.table("ewma_t").as[graft.streaming.EwmaPoint]
        .collect()
      assert(got.map(p => (p.key, p.day, p.n, p.ewmaMilli)).toSet
        === q141Expected)
      assert(got.length === got.map(p => (p.key, p.day)).distinct.length,
        "a (key, day) point emitted twice across micro-batches")
    } finally q.stop()
  }

  test("recurrence pin: hand-computed alpha=1/4 series, incl. truncation") {
    import spark.implicits._
    // e0 = 10000; e1 = (7000 + 3*10000) div 4 = 9250;
    // e2 = (1000 + 3*9250) div 4 = 7187 (truncated from 7187.5)
    val in = Seq(DailyCount("k", 1, 10L), DailyCount("k", 2, 7L),
      DailyCount("k", 3, 1L)).toDS()
    val got = EwmaTracker.track(in).collect().sortBy(_.day)
      .map(_.ewmaMilli).toSeq
    assert(got === Seq(10000L, 9250L, 7187L))
  }
}
