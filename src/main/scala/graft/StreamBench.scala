package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.core._
import graft.streaming.DeltaTracker

/** Streaming throughput micro-bench (the r8 verdict's task 4): rows/sec
  * through the engine's hottest stateful streaming path —
  * MemoryStream → DeltaTracker.statewise (flatMapGroupsWithState) →
  * foreachBatch parquet store — at two micro-batch sizes.
  *
  * The comparison frame is the reference's operational envelope
  * (BASELINE.md: Kafka Streams on 3-8 threads, 10 s commit interval,
  * ≤100-record polls — i.e. designed for ~10-100 records/sec feeds):
  * the number this main prints is how many rows/sec the SAME topology
  * (per-key running delta, every input emitting one output) sustains
  * here, state store + sink write included. MemoryStream feeds from the
  * driver, so the figure is a single-node envelope — the operator
  * itself is key-partitioned (state scales with key cardinality across
  * executors; no global state, no driver loop).
  *
  * Emits ONE JSON line: {"metric":"stream_rows_per_sec","runs":[...]}.
  * A warmup batch is fed outside the clock (state-store init + codegen
  * JIT dominate a cold first micro-batch). StreamBenchSpec runs the
  * same harness small and asserts exactly-once row accounting.
  */
object StreamBench {

  final case class Result(batchRows: Int, batches: Int, keys: Int,
      totalRows: Long, storedRows: Long, sec: Double, rowsPerSec: Double)

  /** One micro-batch: `rows` snapshots over `keys` states, per-key
    * totals strictly increasing across batch indexes so every row
    * produces a real nonzero delta (no degenerate zero-work path).
    * Deterministic in (i, rows, keys). */
  def batch(i: Int, rows: Int, keys: Int): Seq[StampedStats] =
    (0 until rows).map { j =>
      val k = j % keys
      val seq = i.toLong * (rows / keys + 1) + j / keys
      val conf = seq * 7 + k + 1 // +1: k=0's first snapshot must still delta from the zero-init state
      StampedStats(
        new Timestamp(1586300000000L + seq * 1000L + k),
        StatewiseStats(
          active = (conf / 2).toString,
          confirmed = conf.toString,
          deaths = (seq + k).toString,
          recovered = (seq * 2 + k).toString,
          state = s"state-$k",
          statecode = s"S$k",
          lastupdatedtime = "08/04/2020 06:00:00"))
    }

  /** Feed `batches` micro-batches of `batchRows` rows and time the
    * processing (warmup batch excluded). `storedRows` counts what the
    * sink actually persisted for the measured batches — the spec's
    * exactly-once assertion. */
  def run(spark: SparkSession, batchRows: Int, batches: Int, keys: Int,
      outDir: String): Result = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StampedStats]
    val store = s"$outDir/store"
    val warmupRows = math.min(batchRows, 1000)
    val q = DeltaTracker.statewise(ms.toDS())
      .writeStream
      .option("checkpointLocation", s"$outDir/ck")
      .outputMode("append")
      .foreachBatch { (b: Dataset[StampedDelta], _: Long) =>
        b.write.mode("append").parquet(store): Unit
      }
      .start()
    try {
      ms.addData(batch(0, warmupRows, keys))
      q.processAllAvailable()
      // pre-materialize the feeds: driver-side row construction must
      // not charge data-generation cost to the engine's rows/sec
      val feeds = (1 to batches).map(i => batch(i, batchRows, keys))
      val t0 = System.nanoTime()
      feeds.foreach { f =>
        ms.addData(f)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val total = batchRows.toLong * batches
      val stored = spark.read.parquet(store).count() - warmupRows
      Result(batchRows, batches, keys, total, stored, sec, total / sec)
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession
      .configure(SparkSession.builder(), GraftSession.defaultCpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sizes = Seq((10000, 10), (100000, 5))
    val results = sizes.map { case (rows, n) =>
      val dir = Files.createTempDirectory("streambench").toFile.getAbsolutePath
      System.err.println(s"[streambench] batchRows=$rows batches=$n")
      run(spark, rows, n, 40, dir)
    }
    val runs = results.map { r =>
      s"""{"batch_rows":${r.batchRows},"batches":${r.batches},""" +
        s""""keys":${r.keys},"total_rows":${r.totalRows},""" +
        s""""stored_rows":${r.storedRows},"sec":${r.sec},""" +
        s""""rows_per_sec":${math.round(r.rowsPerSec)}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"stream_rows_per_sec","runs":$runs}""")
    spark.stop()
    if (results.exists(r => r.storedRows != r.totalRows)) {
      System.err.println("[streambench] row accounting mismatch")
      sys.exit(1)
    }
  }
}
