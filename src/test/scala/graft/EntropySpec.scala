package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{EntropyPoint, EntropyTracker, TypeCount}

/** EntropyTracker: batch-stream duality with q233's per-day Shannon
  * entropy, micro-batch-split invariance (counts arrive as DELTAS),
  * and a hand-computed quantization pin. */
class EntropySpec extends SparkSpec {

  private def q233Expected: Map[Int, (Long, Long)] =
    graft.queries.Registry.byName("q233_event_entropy").fn(spark, sf)
      .select(datediff(col("day"), lit("1970-01-01").cast("date")).as("day"),
        col("n"), col("h_u6"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def typeCounts = {
    import spark.implicits._
    graft.sources.Tables.load(spark, sf, "events")
      .groupBy(
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .as("day"),
        col("event_type").as("eventType"))
      .agg(count(lit(1)).as("c"))
      .as[TypeCount]
  }

  test("batch form's final points are bit-identical to q233") {
    val got = EntropyTracker.track(typeCounts).collect()
      .map(p => p.day -> (p.n, p.hU6)).toMap
    val expected = q233Expected
    assert(expected.nonEmpty, "no daily mixes at this sf — vacuous")
    assert(got === expected)
  }

  test("delta feeds across micro-batches converge to the batch answer") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // counts arrive as PARTIAL deltas: each day's per-type total is
    // split 1 + (rest) across two micro-batches, plus a third batch of
    // late extra rows for one type — the tracker must fold, not replace
    val all = typeCounts.collect()
    val first = all.map(t => t.copy(c = 1L))
    val rest = all.filter(_.c > 1).map(t => t.copy(c = t.c - 1))
    val ms = MemoryStream[TypeCount]
    val q = EntropyTracker.track(ms.toDS())
      .writeStream.format("memory").queryName("entropy_t")
      .outputMode("append").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(rest.toSeq); q.processAllAvailable()
      val emissions = spark.table("entropy_t").as[EntropyPoint].collect()
      // one emission per (day, micro-batch that touched it); the LAST
      // per day is the live reading — compare it to batch
      val last = emissions.zipWithIndex.groupBy(_._1.day)
        .map { case (d, xs) => d -> xs.maxBy(_._2)._1 }
      assert(last.map { case (d, p) => d -> (p.n, p.hU6) } === q233Expected)
      // the mid-feed reading existed and differed (entropy refined)
      assert(emissions.length > last.size, "no intermediate readings")
    } finally q.stop()
  }

  test("quantization pin: hand-computed two-type mix") {
    // counts (3, 1): n = 4
    // term(3) = 1e6 * 0.75 * ln(4/3)  = 215762.4708...  -> 215762
    // term(1) = 1e6 * 0.25 * ln(4)    = 346573.5902...  -> 346574
    val (n, h) = EntropyTracker.entropyU6(Seq(3L, 1L))
    assert(n == 4L)
    assert(h == 215762L + 346574L)
    // single-type mix: ln(1) = 0 exactly
    assert(EntropyTracker.entropyU6(Seq(7L)) == ((7L, 0L)))
  }
}
