package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{KeyedHash, KmvPoint, KmvTracker}

/** KmvTracker: batch-stream duality with q259's deterministic distinct
  * sketch — the strongest duality in the tracker family (a set of mins
  * is order- AND duplicate-immune, so the streaming final state is
  * BIT-identical to the batch aggregate, not merely within tolerance),
  * proved under a 3-way split with replayed (at-least-once) rows. */
class KmvStreamSpec extends SparkSpec {

  private def hashed = graft.sources.Tables.load(spark, sf, "events")
    .select(col("event_type").as("key"),
      (conv(substring(md5(col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("long") + 1).as("h"))

  private def q259Expected: Map[String, Long] =
    graft.queries.Registry.byName("q259_kmv_distinct").fn(spark, sf)
      .select("event_type", "est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("final streaming state is bit-identical to the batch sketch (q259)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val all = hashed.as[KeyedHash].collect()
    assert(all.nonEmpty)
    // 3 micro-batches: two prefix splits plus a REPLAY of the first
    // third (at-least-once delivery) — none of it may move a min
    val (a, rest) = all.splitAt(all.length / 3)
    val (b, c) = rest.splitAt(rest.length / 2)
    val ms = MemoryStream[KeyedHash]
    val q = KmvTracker.track(ms.toDS(), 256)
      .writeStream.format("memory").queryName("kmv_t")
      .outputMode("append").start()
    try {
      ms.addData(a.toSeq); q.processAllAvailable()
      ms.addData(b.toSeq); q.processAllAvailable()
      ms.addData((c ++ a).toSeq); q.processAllAvailable()
      val emissions = spark.table("kmv_t").as[KmvPoint].collect()
      val last = emissions.zipWithIndex.groupBy(_._1.key)
        .map { case (k, xs) => k -> xs.maxBy(_._2)._1 }
      assert(last.map { case (k, p) => k -> p.est } === q259Expected)
      // the batch k-th min must match the streaming one bit-for-bit
      val E = graft.functions.expressions.GraftExpressions
      val batchK = hashed.groupBy("key")
        .agg(E.kmvMins(col("h"), 256).as("sk"))
        .select(col("key"),
          expr("CASE WHEN size(sk) < 256 THEN 0L ELSE element_at(sk, 256) END")
            .as("hk"))
        .as[(String, Long)].collect().toMap
      assert(last.map { case (k, p) => k -> p.hK } === batchK)
      // estimates refined across batches (some intermediate reading)
      assert(emissions.length > last.size, "no intermediate readings")
    } finally q.stop()
  }

  test("estimator pin: exact below saturation, (k-1)*2^48/U_(k) at it") {
    assert(KmvTracker.estimate(Seq(10L, 20L, 30L), 256) === 3L)
    // saturated k=2: est = 1 * 2^48 / 1024
    assert(KmvTracker.estimate(Seq(512L, 1024L), 2) ===
      281474976710656L / 1024L)
  }
}
