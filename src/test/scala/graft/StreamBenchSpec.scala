package graft

import java.nio.file.Files

/** Runs the streaming-throughput harness small: the point is not the
  * rate (meaningless at this size) but the row accounting — every fed
  * row lands in the store exactly once, warmup excluded.
  */
class StreamBenchSpec extends SparkSpec {

  test("stream micro-bench: every measured row lands exactly once in the store") {
    val dir = Files.createTempDirectory("sbspec").toFile.getAbsolutePath
    val r = StreamBench.run(spark, batchRows = 400, batches = 3, keys = 8, dir)
    assert(r.totalRows === 1200L)
    assert(r.storedRows === 1200L, "sink lost or duplicated rows")
    assert(r.rowsPerSec > 0.0)
    // the store carries real deltas: per-key totals were strictly
    // increasing, so every measured row's confirmed delta is positive
    val neg = spark.read.parquet(s"$dir/store")
      .filter("delta.deltaConfirmed <= 0").count()
    assert(neg === 0L, s"$neg rows with non-positive delta — degenerate feed")
  }
}
